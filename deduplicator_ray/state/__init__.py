"""Engine state: checkpoint/lineage for resume, and the sharded
digest-index actor service for the incremental lookup mode."""
