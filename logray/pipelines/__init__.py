from logray.pipelines.flagship import (
    PipelineConfig,
    build,
    run_pipeline,
    run_pipeline_resumable,
)

from logray.pipelines.crawl import (
    read_crawl_output,
    run_crawl_pipeline,
    warc_partitions,
)

__all__ = ["PipelineConfig", "build", "run_pipeline",
           "run_pipeline_resumable", "run_crawl_pipeline",
           "read_crawl_output", "warc_partitions"]
