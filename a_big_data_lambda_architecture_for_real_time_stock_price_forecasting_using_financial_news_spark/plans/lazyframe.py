"""Deferred-replay DataFrame proxy for the streaming registry entries.

The streaming ``t*`` entries (and the staged-view entries p15/u9/t19)
genuinely EXECUTE work to produce their result: they replay a bounded
stream through a real Structured Streaming query (memory sink /
foreachBatch merge) or stage keyed parquet views, then return a batch
DataFrame over the materialized state. Through r9 that execution ran
inside the ``queries()`` builder itself, so merely CONSTRUCTING the
entry — schema audits, plan walks, any harness that inspects before it
runs — triggered the whole replay (VERDICT r9 item 8).

:class:`LazyReplayFrame` splits plan-build from replay at the Python
boundary, the only place a Structured Streaming replay CAN be deferred:
a streaming query's results do not exist as a Catalyst plan until the
query has run, so laziness here means "don't run it until someone
actually touches the result". The proxy is a genuine
``pyspark.sql.DataFrame`` subclass (isinstance-compatible with every
harness), holds only a thunk at construction, and materializes the real
frame on FIRST attribute access — ``collect``, ``schema``, ``write``,
column access, anything — then delegates every subsequent touch to it.
Behavior under the driver is byte-identical (it constructs, then
collects); the construction itself becomes free.

Spark 4 note: ``pyspark.sql.DataFrame.__new__`` is a facade that
forwards to ``pyspark.sql.classic.dataframe.DataFrame``, so the proxy
subclasses the classic implementation directly and overrides
``__new__``/``__init__`` to skip the JVM-handle constructor — every
instance attribute it owns is whitelisted in ``__getattribute__`` and
everything else routes through the materialized delegate (implicit
dunder calls like ``df["c"]`` resolve on the type but read ``_jdf``
through the instance, so they materialize too).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql.classic.dataframe import DataFrame as _ClassicDataFrame

_LOCAL = frozenset(
    {
        "_lazy_thunk",
        "_lazy_mat",
        "is_materialized",
        "__class__",
        "__dict__",
    }
)


class LazyReplayFrame(_ClassicDataFrame):
    """A DataFrame whose backing replay runs on first touch, not at
    construction. ``thunk`` must return the real (batch) DataFrame."""

    def __new__(cls, thunk: Callable[[], DataFrame]):
        return object.__new__(cls)

    def __init__(self, thunk: Callable[[], DataFrame]):
        object.__setattr__(self, "_lazy_thunk", thunk)
        object.__setattr__(self, "_lazy_mat", None)

    @property
    def is_materialized(self) -> bool:
        return object.__getattribute__(self, "_lazy_mat") is not None

    def _materialize(self) -> DataFrame:
        mat = object.__getattribute__(self, "_lazy_mat")
        if mat is None:
            thunk = object.__getattribute__(self, "_lazy_thunk")
            mat = thunk()
            object.__setattr__(self, "_lazy_mat", mat)
        return mat

    def __getattribute__(self, name):
        if name in _LOCAL or name == "_materialize":
            return object.__getattribute__(self, name)
        try:
            real = LazyReplayFrame._materialize(self)
        except AttributeError as e:
            # An AttributeError escaping __getattribute__ makes Python fall
            # back to the CLASS's __getattr__ — the classic DataFrame's
            # column lookup, which reads self.columns on the (still
            # unmaterialized, _jdf-less) proxy and recurses forever. A
            # builder bug must surface as the builder's error, not as
            # infinite recursion.
            raise RuntimeError(
                f"lazy replay builder raised while materializing: {e!r}"
            ) from e
        return getattr(real, name)

    def __setattr__(self, name, value):
        # nobody should mutate a result frame, but if they do, mutate the
        # delegate so reads (which all route there) observe the write
        setattr(LazyReplayFrame._materialize(self), name, value)

    def __repr__(self):
        mat = object.__getattribute__(self, "_lazy_mat")
        if mat is None:
            return "LazyReplayFrame(<unmaterialized>)"
        return repr(mat)
