"""Frame orchestration, offline rendering, adaptive sampling, app shell.
Counterpart of the reference's Renderer orchestrator (L3) and Application
shell (L5)."""
