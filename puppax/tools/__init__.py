"""puppax.tools — host-side eval/render/logging/plotting (off the hot path)."""

from puppax.tools.metrics import MetricsLogger, make_progress_fn  # noqa: F401
