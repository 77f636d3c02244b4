from hsearch_spark.functions.text import canonicalize_text_col
from hsearch_spark.functions.signatures import add_signature_columns

__all__ = ["canonicalize_text_col", "add_signature_columns"]
