from .text import (
    DEFAULT_STOPWORDS,
    clean_text,
    filter_stopwords,
    lemmatize_udf,
    token_count,
    tokenize,
    tokens_pipeline,
)
from .vector import cosine_similarity, dot, l2_norm

__all__ = [
    "DEFAULT_STOPWORDS",
    "clean_text",
    "filter_stopwords",
    "lemmatize_udf",
    "token_count",
    "tokenize",
    "tokens_pipeline",
    "cosine_similarity",
    "dot",
    "l2_norm",
]
