"""Ship a module's functions INSIDE UDF closures (pickle by value).

cloudpickle serializes module-level functions BY REFERENCE: the worker
re-imports them. That breaks any pandas/Arrow UDF whose closure touches a
chronon_spark function when the driver was launched from a cwd where the
package isn't importable by the Python workers (sys.path patches on the
driver don't propagate). Registering the defining module for by-value
pickling makes the closure self-contained — the worker needs only the
stdlib. Call ship_by_value(__name__) before defining such a UDF."""

from __future__ import annotations

import sys


def ship_by_value(module_name: str) -> None:
    try:
        from pyspark import cloudpickle

        cloudpickle.register_pickle_by_value(sys.modules[module_name])
    except Exception:
        # older cloudpickle without the API: by-reference fallback (works
        # whenever the package IS importable on workers, e.g. cwd = repo)
        pass
