"""Sources/sinks: the minimal Iceberg-layout snapshot table used for
checkpointed, resumable stage materialization."""
