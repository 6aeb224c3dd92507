"""Attribute-to-prompt templating for portrait generation.

Redesigned from musev/auto_prompt/ (PortraitAttr2PromptTemplate, human.py;
attribute renderers, attributes/attributes.py; task fan-out,
auto_prompt/util.py:generate_prompts called at text2video.py:829): a task
whose prompt contains ``{}`` (or is empty) is expanded through a named
template that renders its attribute fields into text; ``|``-separated
attribute values fan one task out into several.
"""

from __future__ import annotations

import copy
from typing import Callable, Dict, List, Optional


def render_value(value: str) -> str:
    """'red,long' -> 'red, long'."""
    if not value:
        return ""
    return ", ".join(v.strip() for v in str(value).split(",") if v.strip())


def render_named(name: str) -> Callable[[str], str]:
    """'black' with name 'hair' -> 'black hair'."""

    def fn(value: str) -> str:
        if not value:
            return ""
        return ", ".join(
            f"{v.strip()} {name}" for v in str(value).split(",") if v.strip()
        )

    return fn


class PortraitTemplate:
    """``a portrait of {attributes}`` with the reference's portrait fields."""

    name = "portrait"
    template = "a portrait of {}"
    # attribute key -> renderer; ordered as rendered
    fields: Dict[str, Callable[[str], str]] = {
        "gender": render_value,
        "age": render_named("years old"),
        "race": render_value,
        "hair": render_named("hair"),
        "eyes": render_named("eyes"),
        "face": render_value,
        "expression": render_value,
        "clothes": render_value,
        "background": render_value,
        "style": render_value,
        "prompt_extra": render_value,
    }

    def __call__(self, task: Dict) -> List[str]:
        # fan out on '|' alternatives per field
        variants: List[Dict[str, str]] = [{}]
        for key in self.fields:
            raw = task.get(key)
            if raw is None:
                continue
            options = [o.strip() for o in str(raw).split("|")]
            variants = [
                {**v, key: opt} for v in variants for opt in options
            ]
        prompts = []
        for v in variants:
            parts = [
                self.fields[k](val) for k, val in v.items() if self.fields[k](val)
            ]
            body = ", ".join(parts)
            template = task.get("template") or self.template
            prompt = template.format(body) if "{}" in template else template
            if task.get("prompt") and "{}" in task["prompt"]:
                prompt = task["prompt"].replace("{}", body)
            prompts.append(prompt)
        return prompts or [task.get("prompt", "")]


_TEMPLATES = {"portrait": PortraitTemplate()}


def get_template(name: Optional[str]) -> PortraitTemplate:
    return _TEMPLATES.get(name or "portrait", _TEMPLATES["portrait"])


def generate_prompts(tasks: List[Dict]) -> List[Dict]:
    """Expand templated tasks into concrete-prompt tasks
    (auto_prompt/util.py semantics: plain non-empty prompts pass through)."""
    out = []
    for task in tasks:
        task = dict(task)
        task["origin_prompt"] = task.get("prompt", "")
        prompt = task.get("prompt", "")
        if prompt and "{" not in prompt:
            out.append(task)
            continue
        template = get_template(task.get("template_name"))
        for p in template(task):
            t = copy.deepcopy(task)
            t["prompt"] = p
            out.append(t)
    return out
