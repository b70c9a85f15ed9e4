from .vocab import top_k_vocabulary, word_counts
from .features import presence_tf, tf_idf, document_frequency

__all__ = [
    "top_k_vocabulary",
    "word_counts",
    "presence_tf",
    "tf_idf",
    "document_frequency",
]
