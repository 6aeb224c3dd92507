"""Auto-prompt attribute zoo (reference musev/auto_prompt/attributes/)."""

import json

import numpy as np

from musev_tpu.autoprompt import generate_prompts
from musev_tpu.autoprompt.attributes import (
    RENDER_MAP,
    RNG,
    get_attr,
    insight_face,
    merge_near_same_char,
    render_template,
)


def test_value_and_name_and_age():
    assert get_attr("hair")("black,long") == "black hair, long hair"
    assert get_attr("age")("25") == "25-year-old"
    assert get_attr("eyes")("") == ""
    assert get_attr("unknown_attr")("x,y") == "x, y"  # fallback


def test_render_presets():
    assert get_attr("render")("HD") == RENDER_MAP["HD"]
    out = get_attr("render")("HD,Epic")
    assert RENDER_MAP["HD"] in out and RENDER_MAP["Epic"] in out
    assert get_attr("render")("NotAPreset") == ""


def test_random_choice_attrs_seeded():
    RNG.seed(0)
    a = get_attr("env")("")
    RNG.seed(0)
    b = get_attr("env")("")
    assert a == b and a  # deterministic under seed, non-empty
    assert get_attr("env")("beach") == "beach"  # explicit value wins


def test_insight_face_renderer():
    # two girls, one boy, one black face -> counts, dedup, african prefix
    info = {
        "image_type": "face",
        "info": [
            {"gender": 0, "ratio": 0.5},
            {"gender": 0, "ratio": 0.4, "black": True},
            {"gender": 1, "ratio": 0.3},
            {"gender": 1, "ratio": 0.01},  # below ratio threshold: ignored
        ],
    }
    out = insight_face(json.dumps(info))
    assert "2girls" in out and "1boy" in out
    assert out.startswith("african,dark skin,")
    assert "delicate face,beautiful eyes" in out
    assert "solo" not in out
    # single face adds solo; no girls adds male focus
    solo = insight_face(json.dumps(
        {"image_type": "face", "info": [{"gender": 1, "ratio": 0.5}]}
    ))
    assert solo.endswith(",solo") and "male focus" in solo
    # body shots: only the african/dark-skin signal survives
    assert insight_face(json.dumps(
        {"image_type": "body", "info": [{"black": True}]}
    )) == "african,dark skin"
    assert insight_face(json.dumps({"image_type": "face", "info": []})) == ""


def test_key_brace_template():
    task = {"hair": "black", "clothes": "red dress", "render": "HD"}
    (out,) = render_template(
        "a girl with {hair}, wearing {clothes}, {render}", task
    )
    assert "black hair" in out and "red dress" in out and "8k" in out
    # fan-out inside a key-brace template
    outs = render_template("a {sex} dancing", {"sex": "girl|boy"})
    assert len(outs) == 2


def test_merge_near_same_char():
    assert merge_near_same_char("a, ,, b,,c") == "a, b, c"
    assert merge_near_same_char(", x,") == "x"


def test_generate_prompts_key_brace_prompt():
    tasks = [{"prompt": "portrait: {hair}, {render}", "hair": "pink",
              "render": "HD"}]
    out = generate_prompts(tasks)
    assert len(out) == 1
    assert "pink hair" in out[0]["prompt"]
    assert "8k" in out[0]["prompt"]
    assert out[0]["origin_prompt"].startswith("portrait:")


# -- round-3 table tests: outputs hand-derived from the reference classes
# (auto_prompt/util.py generate_prompts + attr2template.py semantics) -------


def test_generate_prompts_empty_prompt_is_only_space_template():
    # load_template.py:25-26: empty prompt -> OnlySpacePromptTemplate -> ""
    from musev_tpu.autoprompt import generate_prompts

    out = generate_prompts([{"name": "t", "prompt": ""}])
    assert len(out) == 1 and out[0]["prompt"] == ""
    assert out[0]["origin_prompt"] == ""


def test_generate_prompts_table_portrait():
    """Portrait bare-{} template against the reference pipeline by hand:
    PresetPortraitAttributes order, ', ' joins, merge_near_same_char."""
    from musev_tpu.autoprompt import generate_prompts

    task = {
        "prompt": "a portrait of {}",
        "age": "25",
        "sex": "female",
        "hair": "black",
        "clothes": "red dress",
        "render": "HD",
    }
    out = generate_prompts([task])
    assert len(out) == 1
    assert out[0]["prompt"] == (
        "a portrait of 25-year-old, female, black hair, red dress, "
        "8k, highly detailed"
    )


def test_generate_prompts_render_multi_fans_out():
    """render 'Epic,HD' returns two texts; MultiAttr2Text outer-products
    them into two prompts (reference attributes.py:100-116)."""
    from musev_tpu.autoprompt import generate_prompts

    out = generate_prompts([
        {"prompt": "a portrait of {}", "sex": "male", "render": "Epic,HD"}
    ])
    assert [t["prompt"] for t in out] == [
        "a portrait of male, artstation, epic environment, highly detailed, "
        "8k, HD",
        "a portrait of male, 8k, highly detailed",
    ]


def test_generate_prompts_keyword_template_table():
    from musev_tpu.autoprompt import generate_prompts

    out = generate_prompts([
        {"prompt": "{age} {country} man, {render}", "age": "30",
         "country": "japanese", "render": "Digital"}
    ])
    assert out[0]["prompt"] == (
        "30-year-old japanese man, detailed illustration, crisp lines, "
        "digital art, 8k, trending on artstation"
    )


def test_generate_prompts_passthrough_records_origin():
    from musev_tpu.autoprompt import generate_prompts

    out = generate_prompts([{"prompt": "a cat"}])
    assert out[0]["prompt"] == "a cat"
    assert out[0]["origin_prompt"] == "a cat"
