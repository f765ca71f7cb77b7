from camden_spark.sources.pages import (
    load_pages,
    normalize_pages,
    pages_from_documents,
)

__all__ = ["load_pages", "pages_from_documents", "normalize_pages"]
