from .batch import bm25_topk_batch  # noqa: F401
from .bm25 import bm25_topk_dataframe  # noqa: F401
from .phrase import (  # noqa: F401
    bm25_phrase_prefix_topk,
    bm25_phrase_topk,
    passages,
    phrase_spans,
)
from .search import search, search_many  # noqa: F401
from .wand import bm25_topk_blockmax  # noqa: F401
