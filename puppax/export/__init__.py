"""puppax.export — policy -> on-robot JSON deployment ABI."""

from puppax.export.params import (  # noqa: F401
    apply_exported_policy,
    convert_params,
    fold_in_normalization,
)
