"""Task-spec loading: YAML (with `${.key}` interpolation) and CSV.

Reference: configs/tasks/example.yaml loaded via OmegaConf at
scripts/inference/text2video.py:808-820, plus CSV tables via mmcm
generate_tasks_from_table. Only OmegaConf-style ``${.key}`` interpolation
is resolved at load time; bare ``{key}`` braces are deliberately LEFT
ALONE — they belong to the auto-prompt attribute registry
(autoprompt.attributes has_key_brace / attr2template, reference
text2video.py:829), which renders them later with attribute semantics
('black' -> 'black hair', render presets, '|' task fan-out).
"""

from __future__ import annotations

import csv
import re
from typing import Any, Dict, List

import yaml

_REF = re.compile(r"\$\{\.?([A-Za-z0-9_]+)\}")


def _resolve(task: Dict[str, Any]) -> Dict[str, Any]:
    out = dict(task)
    for _ in range(4):  # few passes handle chained refs
        changed = False
        for k, v in out.items():
            if not isinstance(v, str):
                continue
            def sub_ref(m):
                key = m.group(1)
                return str(out.get(key, m.group(0)))
            nv = _REF.sub(sub_ref, v)
            if nv != v:
                out[k] = nv
                changed = True
        if not changed:
            break
    return out


def load_tasks_yaml(path: str) -> List[Dict[str, Any]]:
    with open(path) as f:
        data = yaml.safe_load(f)
    if isinstance(data, dict):
        data = [data]
    return [_resolve(t) for t in data]


def load_tasks_csv(path: str) -> List[Dict[str, Any]]:
    with open(path, newline="") as f:
        return [_resolve(dict(row)) for row in csv.DictReader(f)]


def load_tasks(path: str) -> List[Dict[str, Any]]:
    if path.endswith((".yaml", ".yml")):
        return load_tasks_yaml(path)
    if path.endswith(".csv"):
        return load_tasks_csv(path)
    raise ValueError(f"unsupported task file {path!r} (yaml/csv)")
