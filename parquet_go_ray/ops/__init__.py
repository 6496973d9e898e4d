"""Large-scale training-data operators: text analysis, dedup, similarity, multimodal."""
