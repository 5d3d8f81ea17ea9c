"""LLM-data-pipeline operators (SURVEY.md §2.9, BASELINE.json north star).

Dedup (exact / MinHash-LSH / SimHash / n-gram jaccard), similarity search
over embeddings, text analysis (stats, tokenization, tf-idf, language id,
quality scoring, fingerprinting), and multimodal binary-column plumbing.
"""

from . import (  # noqa: F401
    ann_index,
    dedup,
    multimodal,
    sampling,
    similarity,
    text,
)
