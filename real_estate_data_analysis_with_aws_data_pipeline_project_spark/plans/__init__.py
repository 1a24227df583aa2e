from .reference_pipeline import enriched_sample_pipeline

__all__ = ["enriched_sample_pipeline"]
