"""End-to-end job plans (the engine's analog of the reference DAG tasks)."""
