"""Checkpoint save/load for model state pytrees.

Replaces mmcv CheckpointConfig (/root/reference/lib/apis/train.py:141-144):
the full state dict (params, EMA copies, optimizer states, running buffers)
is serialized with flax msgpack; loading restores into a template produced
by ``model.init_state`` so treedefs always match.
"""
import os

import numpy as np
import jax
from flax import serialization


def save_checkpoint(path, state, iteration=0, meta=None):
    os.makedirs(os.path.dirname(path) or '.', exist_ok=True)
    payload = {
        'state': serialization.to_state_dict(
            jax.tree_util.tree_map(np.asarray, _strip_none(state))),
        'iteration': iteration,
        'meta': meta or {},
    }
    data = serialization.msgpack_serialize(payload)
    tmp = path + '.tmp'
    with open(tmp, 'wb') as f:
        f.write(data)
    os.replace(tmp, path)


def load_checkpoint(path, template=None, lenient=False):
    """Returns (state, iteration, meta). If ``template`` is given, the state
    is restored into its treedef (required for optax states).

    ``lenient=True`` restores per top-level key and SKIPS keys whose saved
    structure does not match the template (returning the template's fresh
    value there) or that only one side has.  Inference uses this: eval
    (test.py / init_model) rebuilds optimizer states without the training
    run's lr-schedule chain, so ``opt_*`` treedefs legitimately differ —
    and eval never reads them.  Training resume stays strict.
    """
    with open(path, 'rb') as f:
        payload = serialization.msgpack_restore(f.read())
    state = payload['state']
    if template is not None:
        tmpl = _strip_none(template)
        if lenient:
            out = dict(tmpl)
            for k, v in tmpl.items():
                if k not in state:
                    print(f'[checkpoint] {k}: missing in checkpoint, '
                          f'keeping fresh value')
                    continue
                try:
                    out[k] = serialization.from_state_dict(v, state[k])
                except (ValueError, KeyError, TypeError) as e:
                    print(f'[checkpoint] {k}: structure mismatch, keeping '
                          f'fresh value ({str(e)[:120]})')
            state = out
        else:
            state = serialization.from_state_dict(tmpl, state)
    return state, payload.get('iteration', 0), payload.get('meta', {})


def _strip_none(state):
    """msgpack can't serialize None leaves (e.g. init_code=None)."""
    if isinstance(state, dict):
        return {k: _strip_none(v) for k, v in state.items() if v is not None}
    return state
