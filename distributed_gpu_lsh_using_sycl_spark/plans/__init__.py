"""Pipeline plans: staged, checkpointed, resumable dedup runs."""
