"""puppax.tools — host-side tooling: rendering, metrics logging, plotting."""
