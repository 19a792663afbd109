from .build import build_index, extract_text, term_doc_tf  # noqa: F401
from .catalog import IndexCatalog  # noqa: F401
from .maintenance import delete_docs  # noqa: F401
