"""Multimodal column plumbing (SURVEY.md §2.9 llm_multimodal_cols).

Images/audio/video are opaque ``binary`` columns + a typed metadata struct.
The Spark-side machinery is real and tested: schema, Arrow-batched
``mapInPandas`` feature extraction, partition-preserving dataflow. Actual
media decoding is STUBBED (image/audio libs are not in this container):
``decode_image`` raises NotImplementedError and the pipeline uses a
deterministic fake featurizer instead, so row counts / schemas / batching
are exercised end-to-end.

Scale notes: binary payloads ride in the same parquet row groups; the
extractor is an Arrow-batched map (no shuffle, no collect) so it scales to
any corpus; per-batch vectorized numpy keeps the Python cost per row tiny.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table
from ..registry import query

FEATURE_DIM = 4

_OUT_SCHEMA = (
    "doc_id long, mime string, n_bytes long, head_byte long, "
    "feat array<double>"
)


def decode_image(payload: bytes):  # pragma: no cover - intentional stub
    """STUB: real image decode (PIL/libvips) is unavailable in this
    container. The surrounding dataflow treats the payload as opaque."""
    raise NotImplementedError(
        "media decoding is stubbed in this environment; "
        "use fake_features() for deterministic plumbing tests"
    )


def fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in featurizer: cheap byte statistics."""
    if not payload:
        return [0.0] * FEATURE_DIM
    n = len(payload)
    return [
        float(n),
        float(payload[0]),
        float(payload[-1]),
        float(sum(payload[:16]) % 251),
    ]


def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched extractor: one pandas frame per input batch."""
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "mime": pdf["mime"],
                "n_bytes": payloads.map(len),
                "head_byte": payloads.map(lambda b: b[0] if b else -1),
                "feat": payloads.map(fake_features),
            }
        )


@query("llm_multimodal_cols")  # external-format plumbing -> rows-only check
def llm_multimodal_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column pipeline: synthesize payloads (documents.text encoded
    as bytes — the container has no media files), attach typed metadata,
    run the Arrow-batched feature extractor."""
    d = table(spark, sf_dir, "documents")
    blobs = d.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("text/plain").alias("mime"),
    )
    return blobs.mapInPandas(_extract, schema=_OUT_SCHEMA)
