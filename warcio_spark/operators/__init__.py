from . import checker, dedup, indexer, multimodal, similarity, textstats  # noqa: F401
