from .pages import generate_pages, generate_queries, vocabulary, PAGES_SCHEMA

__all__ = ["generate_pages", "generate_queries", "vocabulary", "PAGES_SCHEMA"]
