from .docid import doc_id_of, doc_id_column

__all__ = ["doc_id_of", "doc_id_column"]
