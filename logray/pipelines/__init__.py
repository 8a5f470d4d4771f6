from logray.pipelines.flagship import (
    PipelineConfig,
    build,
    run_pipeline,
    run_pipeline_resumable,
)

__all__ = ["PipelineConfig", "build", "run_pipeline", "run_pipeline_resumable"]
