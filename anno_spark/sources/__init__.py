"""Sources: testdata parquet tables and the synthetic pages corpus."""

from .pages import pages_from_documents, synthesize_pages
from .tables import load_table

__all__ = ["load_table", "pages_from_documents", "synthesize_pages"]
