from .processor import process_sdpa_to_graph, FeatureExtractor  # noqa: F401
