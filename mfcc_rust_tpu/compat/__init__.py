"""Drop-in compatibility shims for upstream Python libraries whose semantics
this framework reproduces (the reference's stated goal, README.md:3)."""

from . import speechpy  # noqa: F401
