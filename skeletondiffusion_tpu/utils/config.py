"""Config system: yaml trees with group selection, ``${...}`` interpolation
and dotted CLI overrides — a dependency-free replacement for the reference's
Hydra/OmegaConf stack (`train_diffusion.py:4-7`, `src/utils/config.py`)
keeping the same key names so reference configs translate ~1:1.

Supported syntax:
* ``defaults: [_self_, {task: hmp}, {dataset: amass}]`` — group entries pull
  ``<group>/<option>.yaml`` into ``cfg[<group>]``.
* ``${a.b.c}`` interpolation (full-value or inline-string).
* ``${eval:'expr'}`` arithmetic on interpolated values (reference registers
  the same resolver, `train_diffusion.py:7`).
* CLI overrides ``group=option`` (re-selects a group file) and
  ``a.b.c=value`` (yaml-parsed leaf override).
"""
from __future__ import annotations

import copy
import os

from typing import Any, Dict, List, Optional

import yaml



def _lookup(cfg: Dict, dotted: str):
    cur: Any = cfg
    for part in dotted.split("."):
        if isinstance(cur, dict) and part in cur:
            cur = cur[part]
        else:
            raise KeyError(dotted)
    return cur


def _resolve_value(expr: str, root: Dict):
    expr = expr.strip()
    if expr.startswith("eval:"):
        body = expr[len("eval:"):].strip()
        if (body.startswith("'") and body.endswith("'")) or (
            body.startswith('"') and body.endswith('"')
        ):
            body = body[1:-1]
        body = _interpolate_str(body, root)
        return eval(body, {"__builtins__": {}}, {"int": int, "float": float, "min": min, "max": max})
    return _lookup(root, expr)


def _find_interp(s: str):
    """First balanced ``${...}`` span (supports nested braces).  Returns
    (start, end_exclusive, inner) or None."""
    start = s.find("${")
    if start < 0:
        return None
    depth = 0
    quote = None  # braces inside quoted ${eval:"..."} bodies are literal
    for i in range(start, len(s)):
        c = s[i]
        if quote is not None:
            if c == quote:
                quote = None
            continue
        if c in ("'", '"'):
            quote = c
        elif s.startswith("${", i):
            depth += 1
        elif c == "}":
            depth -= 1
            if depth == 0:
                return start, i + 1, s[start + 2 : i]
    raise ValueError(f"unbalanced interpolation in {s!r}")


def _interpolate_str(s: str, root: Dict) -> str:
    span = _find_interp(s)
    while span is not None:
        a, b, inner = span
        v = _resolve_value(inner, root)
        s = s[:a] + str(v) + s[b:]
        span = _find_interp(s)
    return s


def _interpolate(node: Any, root: Dict) -> Any:
    if isinstance(node, dict):
        return {k: _interpolate(v, root) for k, v in node.items()}
    if isinstance(node, list):
        return [_interpolate(v, root) for v in node]
    if isinstance(node, str):
        stripped = node.strip()
        span = _find_interp(stripped)
        if span is not None and span[0] == 0 and span[1] == len(stripped):
            v = _resolve_value(span[2], root)
            return _interpolate(v, root) if isinstance(v, (dict, list, str)) else v
        if span is not None:
            return _interpolate_str(node, root)
    return node


def _deep_merge(base: Dict, over: Dict) -> Dict:
    out = dict(base)
    for k, v in over.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def load_config(
    config_dir: str, overrides: Optional[List[str]] = None, resolve: bool = True
) -> Dict[str, Any]:
    """Load ``<config_dir>/config.yaml`` + its default groups + overrides."""
    overrides = list(overrides or [])
    with open(os.path.join(config_dir, "config.yaml")) as f:
        cfg = yaml.safe_load(f) or {}
    cfg.pop("hydra", None)
    defaults = cfg.pop("defaults", [])

    # group selections: defaults list, overridable from CLI `group=option`
    selections: Dict[str, str] = {}
    order: List[str] = []
    for entry in defaults:
        if entry == "_self_" or not isinstance(entry, (dict, str)):
            continue
        if isinstance(entry, dict):
            for g, opt in entry.items():
                if str(g).startswith("override"):
                    continue
                selections[g] = opt
                order.append(g)
    kv_overrides: List[str] = []
    for ov in overrides:
        assert "=" in ov, f"override must be key=value: {ov}"
        key, val = ov.split("=", 1)
        if key in selections:
            selections[key] = val
        else:
            kv_overrides.append(ov)

    for group in order:
        path = os.path.join(config_dir, group, f"{selections[group]}.yaml")
        with open(path) as f:
            sub = yaml.safe_load(f) or {}
        cfg[group] = _deep_merge(cfg.get(group, {}) if isinstance(cfg.get(group), dict) else {}, sub)

    for ov in kv_overrides:
        key, val = ov.split("=", 1)
        val = yaml.safe_load(val)
        parts = key.split(".")
        cur = cfg
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = val

    if resolve:
        cfg = _interpolate(cfg, cfg)
    return cfg


def flatten_config(cfg: Dict[str, Any], groups=("task", "dataset", "model", "method_specs", "cov_matrix")) -> Dict[str, Any]:
    """Merge group sub-dicts into the top level (reference
    `src/utils/config.py:66-74`): group keys win over pre-existing ones."""
    out = {k: v for k, v in cfg.items() if k not in groups}
    for g in groups:
        if isinstance(cfg.get(g), dict):
            out.update(cfg[g])
    return out


def save_config(cfg: Dict[str, Any], path: str):
    """Experiment-folder config snapshot; reference `config.py:77-87`."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f, sort_keys=False)


def snapshot_code(out_dir: str):
    """Self-copy of the framework source into the experiment folder so a run
    is reproducible against the exact code that produced it; reference
    `src/utils/config.py:88-96` (which copies the whole source tree — here a
    single zip of the package + entry scripts, plus the git revision)."""
    import subprocess
    import zipfile

    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    repo_root = os.path.dirname(pkg_root)
    os.makedirs(out_dir, exist_ok=True)
    zip_path = os.path.join(out_dir, "code_snapshot.zip")
    try:
        with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
            for base, _, files in os.walk(pkg_root):
                if "__pycache__" in base:
                    continue
                for fn in files:
                    if fn.endswith(".py"):
                        full = os.path.join(base, fn)
                        zf.write(full, os.path.relpath(full, repo_root))
            for fn in ("train_autoencoder.py", "train_diffusion.py", "eval.py", "bench.py"):
                full = os.path.join(repo_root, fn)
                if os.path.exists(full):
                    zf.write(full, fn)
        rev = subprocess.run(
            ["git", "-C", repo_root, "rev-parse", "HEAD"],
            capture_output=True, text=True, timeout=10,
        )
        if rev.returncode == 0:
            with open(os.path.join(out_dir, "git_revision.txt"), "w") as f:
                f.write(rev.stdout)
    except (OSError, subprocess.TimeoutExpired):
        pass  # snapshotting must never break training


def load_and_merge_autoenc_cfg(diff_cfg: Dict[str, Any], autoenc_cfg_path: str) -> Dict[str, Any]:
    """Diffusion training inherits the autoencoder experiment's stored
    config; reference `src/utils/config.py:14-31`."""
    with open(autoenc_cfg_path) as f:
        ae_cfg = yaml.safe_load(f)
    merged = _deep_merge(ae_cfg, diff_cfg)
    return merged
