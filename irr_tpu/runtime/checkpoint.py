"""Checkpointing (mirrors reference configuration.py:192-314).

`checkpoint_latest.ckpt` written every epoch, copied to
`checkpoint_best.ckpt` on validation improvement, with a JSON stats sidecar.
Restore supports fnmatch include/exclude filtering of param paths (partial /
cross-model restores, configuration.py:252-256) and the reference's
shape-adaptive load (:211-233): a checkpoint value replaces the current
param regardless of shape.

Format: .ckpt is an .npz of '/'-joined param paths -> float32 arrays
(optimizer state optionally under 'opt/'), portable and inspectable.
"""

import fnmatch
import json
import logging
import os
import shutil

import numpy as np
import jax

from ..nn.core import param_paths


def _flatten(tree):
    return {k: np.asarray(v) for k, v in param_paths(tree).items()}


def _path_str(path):
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def _replace_leaves(tree, replacement_fn):
    """Rebuild `tree` with each leaf replaced by replacement_fn(path, leaf)."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    leaves = [replacement_fn(_path_str(path), leaf) for path, leaf in flat]
    return jax.tree_util.tree_unflatten(treedef, leaves)


class CheckpointSaver:
    def __init__(self, prefix="checkpoint", latest_postfix="_latest",
                 best_postfix="_best", extension=".ckpt"):
        self._prefix = prefix
        self._latest_postfix = latest_postfix
        self._best_postfix = best_postfix
        self._extension = extension

    # ------------------------------------------------------------------
    # saving
    # ------------------------------------------------------------------

    def save_latest(self, directory, params, stats_dict=None, store_as_best=False,
                    opt_state=None):
        if not os.path.exists(directory):
            os.makedirs(directory)
        latest = os.path.join(directory, self._prefix + self._latest_postfix + self._extension)
        flat = _flatten(params)
        if opt_state is not None:
            # stored alongside for exact resume; ignored by param-only restores
            for k, v in param_paths(opt_state).items():
                arr = np.asarray(v)
                if arr.dtype == object:
                    continue
                flat["opt/" + k] = arr
        with open(latest, "wb") as f:  # file handle: savez must not append .npz
            np.savez(f, **flat)
        if stats_dict is not None:
            def _jsonable(v):
                if isinstance(v, (bool, int, np.integer)):
                    return int(v)
                if isinstance(v, (float, np.floating)):
                    return float(v)
                return v
            with open(latest.replace(self._extension, ".json"), "w") as f:
                json.dump({k: _jsonable(v) for k, v in stats_dict.items()},
                          f, indent=2, sort_keys=True)
        if store_as_best:
            best = os.path.join(directory, self._prefix + self._best_postfix + self._extension)
            shutil.copyfile(latest, best)
            if stats_dict is not None:
                shutil.copyfile(latest.replace(self._extension, ".json"),
                                best.replace(self._extension, ".json"))
        return latest

    # ------------------------------------------------------------------
    # restoring
    # ------------------------------------------------------------------

    def restore(self, filename, params, include_params="*", exclude_params=()):
        """Load `filename` into a copy of `params`. Keys are filtered with
        fnmatch include/exclude patterns over '/'-joined paths."""
        if not os.path.isfile(filename):
            raise FileNotFoundError(f"Could not find checkpoint file '{filename}'!")
        include = ([include_params] if isinstance(include_params, str) else list(include_params))
        exclude = ([exclude_params] if isinstance(exclude_params, str) else list(exclude_params))

        ckpt = dict(np.load(filename))
        ckpt = {k: v for k, v in ckpt.items() if not k.startswith("opt/")}

        def keep(key):
            inc = any(fnmatch.fnmatch(key, p) for p in include) if include else True
            exc = any(fnmatch.fnmatch(key, p) for p in exclude) if exclude else False
            return inc and not exc

        counts = {"restored": 0, "skipped": 0}

        def pick(path, leaf):
            if path in ckpt and keep(path):
                counts["restored"] += 1
                return ckpt[path]
            counts["skipped"] += 1
            return leaf

        new_params = _replace_leaves(params, pick)
        logging.info("Restored %d params from %s (%d kept from init)",
                     counts["restored"], filename, counts["skipped"])
        return new_params

    def resolve(self, path, mode="resume_from_latest"):
        """A --checkpoint value to a concrete file: directories resolve to
        this saver's latest/best filename (configuration.py:333-348)."""
        if os.path.isdir(path):
            postfix = (self._latest_postfix if mode == "resume_from_latest"
                       else self._best_postfix)
            return os.path.join(path, self._prefix + postfix + self._extension)
        return path

    def restore_opt_state(self, filename, opt_state):
        """Exact-resume path: restore optimizer state leaves saved under 'opt/'."""
        ckpt = dict(np.load(filename))
        counts = {"restored": 0}

        def pick(path, leaf):
            if "opt/" + path in ckpt:
                counts["restored"] += 1
                return ckpt["opt/" + path]
            return leaf

        new_state = _replace_leaves(opt_state, pick)
        logging.info("Restored %d optimizer-state leaves from %s",
                     counts["restored"], filename)
        return new_state
