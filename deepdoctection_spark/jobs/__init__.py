from deepdoctection_spark.jobs.resumable import (  # noqa: F401
    ResumableResult,
    pending_buckets,
    read_manifest,
    run_resumable_extract,
)
