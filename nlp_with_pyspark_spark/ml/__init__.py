from .classify import TextClassifier, evaluate, grid_sweep, tweet_pipeline

__all__ = ["TextClassifier", "evaluate", "grid_sweep", "tweet_pipeline"]
