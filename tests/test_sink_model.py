"""Model-based tests for the Redis sink's building blocks (no Spark).

The streaming pipeline's end state is only as trustworthy as FakeRedis and
the idempotence guard, so both are checked against a plain-dict model under
hypothesis-generated command streams — including replays, which model the
micro-batch retries the marker guard must absorb.
"""

from __future__ import annotations

from collections import defaultdict

from hypothesis import given, settings
from hypothesis import strategies as st

from bootic_stats_aggregates_spark.sinks.redis_sink import FakeRedis

_keys = st.sampled_from(["stats:view:2024:01:01", "stats:buy:2024:01:02", "k"])
_fields = st.sampled_from(["n", "cents", "f"])
_members = st.sampled_from(["1", "2", "42"])

_commands = st.lists(
    st.one_of(
        st.tuples(st.just("HINCRBY"), _keys, _fields, st.integers(-1000, 1000)),
        st.tuples(
            st.just("ZINCRBY"),
            _keys,
            _members,
            st.floats(-100, 100, allow_nan=False),
        ),
        st.tuples(st.just("SADD"), _keys, _members, st.none()),
    ),
    max_size=60,
)


@given(_commands)
@settings(max_examples=200, deadline=None)
def test_fakeredis_matches_dict_model(cmds):
    r = FakeRedis()
    hashes: dict = defaultdict(lambda: defaultdict(int))
    zsets: dict = defaultdict(lambda: defaultdict(float))
    sets: dict = defaultdict(set)
    for cmd, key, a, b in cmds:
        if cmd == "HINCRBY":
            r.hincrby(key, a, b)
            hashes[key][a] += b
        elif cmd == "ZINCRBY":
            r.zincrby(key, b, a)
            zsets[key][a] += b
        else:
            r.sadd(key, a)
            sets[key].add(a)
    assert {k: dict(v) for k, v in r.hashes.items() if v} == {
        k: dict(v) for k, v in hashes.items() if v
    }
    for k, z in zsets.items():
        for m, score in z.items():
            assert abs(r.zsets[k][m] - score) < 1e-9
    assert {k: v for k, v in r.sets.items() if v} == {
        k: v for k, v in sets.items() if v
    }


@given(st.lists(st.tuples(_keys, st.integers(1, 50)), min_size=1, max_size=20))
@settings(max_examples=100, deadline=None)
def test_marker_guard_makes_replays_idempotent(batches):
    """Applying each batch's increments under a SETNX marker: replaying any
    batch (even all of them, repeatedly) must not change final counters."""
    r = FakeRedis()

    def apply_batch(batch_id, key, delta):
        if r.set_marker(f"m:{batch_id}"):
            r.hincrby(key, "n", delta)

    for batch_id, (key, delta) in enumerate(batches):
        apply_batch(batch_id, key, delta)
    snapshot = {k: dict(v) for k, v in r.hashes.items()}
    # adversarial replay: every batch again, twice, out of order
    for batch_id, (key, delta) in list(enumerate(batches))[::-1] * 2:
        apply_batch(batch_id, key, delta)
    assert {k: dict(v) for k, v in r.hashes.items()} == snapshot
