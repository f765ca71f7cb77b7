from camden_spark.plans.pipeline import DedupPipeline, PipelineResult

__all__ = ["DedupPipeline", "PipelineResult"]
