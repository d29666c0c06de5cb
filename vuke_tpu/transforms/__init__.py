"""Transform registry and implementations (numeric lattice + string paths)."""

from .registry import TransformSpec, parse_transform  # noqa: F401
