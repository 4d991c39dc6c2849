"""Checkpoint / resume for SOMF learner state.

The reference's three mechanisms (SURVEY 5: estimator picklability,
joblib.Memory coarse resume, callback artifact dumps) collapse here into
one: the entire learner state is a single pytree, saved either with
orbax (async, sharding-aware — the TPU-native path) or as a plain
``.npz`` (dependency-free fallback). ``partial_fit`` after ``load`` is
the warm-start API, exactly like the reference's
``prepare(...) + partial_fit`` contract (dict_fact.py:313,381).
"""
import os

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["save_state", "load_state", "save_estimator", "load_estimator",
           "CheckpointCallback"]


def _state_to_numpy(state):
    return {f: (np.asarray(getattr(state, f))
                if getattr(state, f) is not None else None)
            for f in state._fields}


def save_state(state, path):
    """Save a SomfState (or any NamedTuple pytree) to ``path``.

    Uses orbax when available and ``path`` has no extension; otherwise
    writes a compressed ``.npz``.
    """
    if not path.endswith('.npz'):
        try:
            import orbax.checkpoint as ocp
            ckptr = ocp.StandardCheckpointer()
            ckptr.save(os.path.abspath(path), dict(
                (k, v) for k, v in _state_to_numpy(state).items()
                if v is not None))
            ckptr.wait_until_finished()
            return path
        except Exception:
            path = path + '.npz'
    arrays = {k: v for k, v in _state_to_numpy(state).items()
              if v is not None}
    np.savez_compressed(path, **arrays)
    return path


def load_state(path, state_cls):
    """Load a state saved by :func:`save_state` into ``state_cls``."""
    if path.endswith('.npz') or os.path.isfile(path + '.npz'):
        if not path.endswith('.npz'):
            path = path + '.npz'
        with np.load(path, allow_pickle=False) as data:
            fields = {f: (jnp.asarray(data[f]) if f in data.files else None)
                      for f in state_cls._fields}
        return state_cls(**fields)
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(path))
    fields = {f: (jnp.asarray(restored[f]) if f in restored else None)
              for f in state_cls._fields}
    return state_cls(**fields)


class CheckpointCallback:
    """Periodic mid-training checkpointing (preemption recovery).

    Pass as ``DictFact(callback=...)``; every ``every`` invocations it
    saves the learner state. Resume with::

        df.prepare(...); df._state = load_state(path, SomfState)
        df.partial_fit(...)

    Restart reproduces the uninterrupted trajectory exactly
    (tests/test_checkpoint.py).
    """

    def __init__(self, path, every=1):
        self.path = path
        self.every = every
        self.n_calls = 0
        self.n_saved = 0

    def __call__(self, *args):
        # callback conventions differ per estimator: DictFact passes
        # itself; ImageDictFact passes itself (holding dict_fact_);
        # fMRIDictFact passes (masker, dict_fact, cpu_time, io_time)
        self.n_calls += 1
        if self.n_calls % self.every:
            return
        state = None
        for obj in args:
            state = getattr(obj, '_state', None)
            if state is None and hasattr(obj, 'dict_fact_'):
                state = getattr(obj.dict_fact_, '_state', None)
            if state is not None:
                break
        if state is not None:
            save_state(state, self.path)
            self.n_saved += 1


def save_estimator(estimator, path):
    """Pickle a fitted estimator (device arrays -> host)."""
    import pickle
    with open(path, 'wb') as f:
        pickle.dump(estimator, f)
    return path


def load_estimator(path):
    import pickle
    with open(path, 'rb') as f:
        return pickle.load(f)
