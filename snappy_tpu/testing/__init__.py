"""Test-support utilities: the scalar oracle codec and corpus locators.

Nothing here is on the product path."""

from . import corpus, oracle  # noqa: F401
