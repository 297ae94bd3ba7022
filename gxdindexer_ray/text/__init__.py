from .extract import EXTRACT_SPEC_VERSION, extract_text, extract_column
from .tokenize import TOKEN_PATTERN, tokenize, tokenize_column, doc_term_counts

__all__ = [
    "EXTRACT_SPEC_VERSION",
    "extract_text",
    "extract_column",
    "TOKEN_PATTERN",
    "tokenize",
    "tokenize_column",
    "doc_term_counts",
]
