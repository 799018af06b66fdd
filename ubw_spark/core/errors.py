"""Error-accumulating validation, the AtomicException analog.

The reference fails a plan with *all* missing capabilities at once, not
just the first (AtomicGen.scala:18-37, AtomicException.scala:5-14,
DataPile.scala:203-249).  ``SpecValidationError`` carries every problem
found in one pre-flight pass.
"""

from __future__ import annotations


class SpecError(Exception):
    """Base error for the spec / param layer."""


class SpecValidationError(SpecError):
    """Raised with the full accumulated list of validation problems."""

    def __init__(self, problems: list[str]):
        self.problems = list(problems)
        super().__init__(
            "query spec validation failed with %d problem(s):\n  - %s"
            % (len(self.problems), "\n  - ".join(self.problems))
        )


class ErrorAccumulator:
    """Collect problems across a whole validation pass, then raise once."""

    def __init__(self) -> None:
        self.problems: list[str] = []

    def add(self, problem: str) -> None:
        self.problems.append(problem)

    def raise_if_any(self) -> None:
        if self.problems:
            raise SpecValidationError(self.problems)
