"""Query registry — one entry per operator from SURVEY.md §2.

Importing this package registers every query; ``REGISTRY`` then backs
``__spark_entry__.queries()`` / ``oracle_sql()``.
"""

from .registry import REGISTRY, Query, register  # noqa: F401

# Import for side effect: each module registers its queries.
from . import apps  # noqa: E402,F401
from . import relational  # noqa: E402,F401
from . import events  # noqa: E402,F401
from . import temporal  # noqa: E402,F401
from . import text_ops  # noqa: E402,F401
from . import dedup_ops  # noqa: E402,F401
from . import similarity_ops  # noqa: E402,F401
from . import pipeline  # noqa: E402,F401
from . import sampling_ops  # noqa: E402,F401
from . import sketch_ops  # noqa: E402,F401
from . import profiling_ops  # noqa: E402,F401
from . import decision  # noqa: E402,F401
from . import packing_ops  # noqa: E402,F401
from . import trade  # noqa: E402,F401
from . import behavior  # noqa: E402,F401
from . import graph_ops  # noqa: E402,F401
from . import lm_ops  # noqa: E402,F401
from . import search_ops  # noqa: E402,F401
from . import multimodal_ops  # noqa: E402,F401
from . import layout_ops  # noqa: E402,F401
from . import tokenizer_ops  # noqa: E402,F401
from . import stream_parity  # noqa: E402,F401
from . import dsir_ops  # noqa: E402,F401

__all__ = ["REGISTRY", "Query", "register"]
