"""LLM-training-data-pipeline queries over documents/embeddings.

Dedup (exact / MinHash+LSH / SimHash / n-gram Jaccard / embedding
cosine), similarity search (exact top-k + LSH-bucketed ANN), text
analysis (quality, language ID, token counting, fingerprinting),
multimodal codecs/keys, curation pipelines, and streaming monitors.
All hash arithmetic is md5-based and pinned so the DuckDB oracle
computes byte-identical values (see functions/dedup.py). Where Spark
and DuckDB must agree on floating-point ranking, dot products are
computed as identical left-to-right double folds and similarities
rounded to 6 dp before ranking.

Round-11 split of the 7.9k-line plans/llm.py into family modules
(r10 verdict #5). Importing this package registers every query; the
driver-visible enumeration order is pinned by
plans/canonical_order.ORDER, not by import order below.
"""

from . import common  # noqa: F401
from . import dedup  # noqa: F401
from . import sketch  # noqa: F401
from . import text  # noqa: F401
from . import ann  # noqa: F401
from . import multimodal  # noqa: F401
from . import pipeline  # noqa: F401
from . import streaming  # noqa: F401
from .common import _SSD_K  # noqa: F401  (tests/test_substring_dedup pins the window)
