"""Orchestration: checkpointed, resumable validation runs."""
