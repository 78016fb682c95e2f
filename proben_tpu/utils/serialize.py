"""Picklable wrapper for closures/lambdas shipped across process boundaries
(reference ``detectron2/utils/serialize.py:5`` PicklableWrapper).

The TPU pipeline rarely forks processes (threads + SPMD instead), but dataset
mapper functions registered in catalogs may still need pickling (e.g. for
multiprocessing-based offline preprocessing)."""

from __future__ import annotations

import pickle


class PicklableWrapper:
    def __init__(self, obj):
        self._obj = obj
        try:
            pickle.dumps(obj)
            self._blob = None
        except Exception:
            import marshal
            import types

            if isinstance(obj, types.FunctionType) and not obj.__closure__:
                self._blob = (marshal.dumps(obj.__code__), obj.__name__)
                self._obj = None
            else:
                raise

    def __call__(self, *args, **kwargs):
        return self._get()(*args, **kwargs)

    def _get(self):
        if self._obj is not None:
            return self._obj
        import marshal
        import types

        code, name = self._blob
        return types.FunctionType(marshal.loads(code), globals(), name)

    def __getattr__(self, name):
        if name.startswith("_"):
            raise AttributeError(name)
        return getattr(self._get(), name)
