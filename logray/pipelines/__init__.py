from logray.pipelines.flagship import PipelineConfig, build, run_pipeline

__all__ = ["PipelineConfig", "build", "run_pipeline"]
