"""End-to-end pipelines: the flagship sketch-build over the tokens table
and the approximate (sketch) versions of Miller's summary verbs."""
