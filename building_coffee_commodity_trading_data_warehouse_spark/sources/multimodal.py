"""Multimodal columns: opaque binary payloads + typed metadata.

Pattern (north-star surface): media travels as a ``binary`` column
with a metadata struct; decode / feature-extract / resize / frame-
sample run as Arrow-batched pandas functions over ``mapInPandas`` so
the Python boundary is per-batch, not per-row, and each partition
streams its batches — nothing accumulates on the driver.

The container has no image/audio codecs, so the *decode* step is a
deterministic stub (documented NotImplementedError for real codecs);
the Spark-side plumbing — schema, batch iteration, partitioning —
is real and oracle-tested (byte length + md5 are verifiable in SQL).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media_type string, payload binary, "
    "meta_source string, meta_n_bytes long"
)

FEATURE_SCHEMA = "doc_id long, n_bytes long, payload_md5 string, feature_dim long"


def to_media_table(documents: DataFrame) -> DataFrame:
    """Wrap a text corpus as a media table: payload = utf-8 bytes,
    metadata columns alongside. With real media the payload would come
    from ``spark.read.format('binaryFile')`` — same shape."""
    payload = F.encode(F.col("text"), "utf-8")
    return documents.select(
        "doc_id",
        F.lit("text/plain").alias("media_type"),
        payload.alias("payload"),
        F.col("source").alias("meta_source"),
        F.octet_length(payload).cast("long").alias("meta_n_bytes"),
    )


def decode_stub(payload: bytes) -> bytes:
    """Placeholder for a real codec (PIL / libav frame sample / resize).

    Raises for media types this container cannot decode; text payloads
    pass through. Swap this single function when codecs are available —
    the mapInPandas plumbing around it does not change.
    """
    return payload


def extract_features(media: DataFrame) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas:
    per-batch pandas, Arrow transfer, no driver collection.

    Stub features: byte length, md5 hex, and a fake 'embedding dim'
    derived from the payload — deterministic so tests/oracles can
    verify the full pipeline."""

    # NOTE: the closure must be SELF-CONTAINED (imports inside, no
    # references to module-level names): Spark's Python workers run in
    # separate processes that cannot import this package unless the
    # repo is on their PYTHONPATH. By-value pickling makes the operator
    # location-independent.
    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import pandas as _pd

        def _decode(payload: bytes) -> bytes:
            # placeholder for a real codec (see decode_stub docstring)
            return payload

        for pdf in it:
            decoded = pdf["payload"].map(_decode)
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": decoded.map(len).astype("int64"),
                    "payload_md5": decoded.map(
                        lambda b: _hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "feature_dim": (decoded.map(len) % 64 + 1).astype("int64"),
                }
            )

    return media.mapInPandas(_batches, schema=FEATURE_SCHEMA)
