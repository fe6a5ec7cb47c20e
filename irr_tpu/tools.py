"""CLI utility helpers (mirrors reference tools.py:67-281)."""

import ast
import fnmatch
import inspect
import os


def str2bool(v):
    if isinstance(v, bool):
        return v
    return str(v).lower() in ("yes", "true", "t", "y", "1")


def str2str_or_none(v):
    if v is None or str(v).lower() in ("none", "null", ""):
        return None
    return str(v)


def str2int_or_none(v):
    if v is None or str(v).lower() in ("none", "null", ""):
        return None
    return int(v)


def str2intlist(v):
    if v is None:
        return None
    if isinstance(v, (list, tuple)):
        return [int(x) for x in v]
    return [int(x) for x in ast.literal_eval(str(v))]


def str2list(v):
    """'[a, b, *glob*]' -> ['a', 'b', '*glob*'] (reference tools.py str2list)."""
    if v is None:
        return []
    if isinstance(v, (list, tuple)):
        return list(v)
    s = str(v).strip()
    if s.startswith("[") and s.endswith("]"):
        s = s[1:-1]
    return [x.strip().strip("'\"") for x in s.split(",") if x.strip()]


def str2dict(v):
    if isinstance(v, dict):
        return v
    return ast.literal_eval(str(v))


def module_classes_to_dict(module, include_classes="*", exclude_classes=()):
    """Public classes of a module, filtered by fnmatch patterns
    (reference tools.py:92-124)."""
    include = [include_classes] if isinstance(include_classes, str) else list(include_classes)
    exclude = [exclude_classes] if isinstance(exclude_classes, str) else list(exclude_classes)
    out = {}
    for name in dir(module):
        obj = getattr(module, name)
        if not inspect.isclass(obj) and not callable(obj):
            continue
        if not any(fnmatch.fnmatch(name, p) for p in include):
            continue
        if any(fnmatch.fnmatch(name, p) for p in exclude):
            continue
        if name.startswith("_"):
            continue
        out[name] = obj
    return out


def kwargs_from_args(args, prefix):
    """Extract {'k': v} from args attributes named '<prefix>_k'
    (reference tools.py:67-77)."""
    prefix_ = prefix + "_"
    return {k[len(prefix_):]: v for k, v in vars(args).items()
            if k.startswith(prefix_) and k != prefix_ + "class"}


def instance_from_kwargs(class_constructor, kwargs):
    """Filter kwargs to the constructor signature and instantiate
    (reference tools.py:84-89)."""
    sig = inspect.signature(class_constructor)
    accepted = set(sig.parameters.keys())
    filtered = {k: v for k, v in kwargs.items() if k in accepted}
    return class_constructor(**filtered)


def write_dictionary_to_file(sorted_items, filename):
    d = os.path.dirname(filename)
    if d and not os.path.exists(d):
        os.makedirs(d)
    with open(filename, "w") as f:
        for key, value in sorted_items:
            f.write(f"{key}: {value}\n")
