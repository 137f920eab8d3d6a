"""Deterministic synthetic fixtures (FIXTURES.md F1-F7).

The reference ships no test suite (SURVEY.md §5); these seeded generators
are the correctness substrate.  Everything is a pure function of the seed
— no external data, no network, no wall clock.
"""

from nilinker_spark.fixtures.kb import KBFixture, make_kb  # noqa: F401
from nilinker_spark.fixtures.webtext import make_webtext  # noqa: F401
