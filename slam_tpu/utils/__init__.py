"""Config, dataset IO, synthetic scenes, metrics, analysis."""
