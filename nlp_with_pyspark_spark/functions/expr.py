"""Expression-level helpers for Catalyst higher-order functions.

The one foot-gun this module exists for: a lambda inside ``transform`` /
``zip_with`` / ``aggregate`` that references a DERIVED column expression
(not a plain attribute) re-evaluates that expression on EVERY element —
Catalyst's CollapseProject inlines the alias into the lambda body and
there is no common-subexpression elimination across lambda invocations.
A shingle builder that slices a regex-tokenized array per position goes
O(tokens²·regex) per row: measured 18.7 s for a 5 000-doc scan that runs
in 0.9 s once bound (see operators/decontam.py history). Harmless on
200-token test docs; fatal on the 100 k-token documents a real corpus
contains.

``flet`` (functional *let*) is the expression-level fix: bind the value
once as a lambda variable, evaluate the body against the bound variable.
Unlike a ``localCheckpoint`` barrier it costs nothing — no
materialization, stays inside whole-stage codegen — and unlike relying
on projection boundaries it cannot be optimized away.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def flet(value: Column, body: Callable[[Column], Column]) -> Column:
    """``let value in body``: evaluate ``value`` ONCE, feed the bound
    result to ``body`` as a lambda variable.

    Implemented as ``transform(array(value), v -> body(v))[1]`` — the
    single-element array evaluates ``value`` exactly once, and every
    reference inside ``body`` hits the bound lambda variable instead of
    re-running the expression. Works for any element type Spark arrays
    support (including arrays and structs).
    """
    return F.element_at(F.transform(F.array(value), body), 1)
