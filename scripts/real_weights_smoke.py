"""Real-weights operational smoke: the first-real-user path.

VERDICT r4 item 8. Given ACTUAL checkpoint paths (flags or env vars), this

  1. prints a per-slot key report BEFORE building anything: for every
     provided checkpoint, how many of the model's expected torch keys it
     supplies, which expected keys are MISSING (would silently stay at
     random init), and which checkpoint keys are UNCONSUMED (naming
     drift / wrong file) — the report the reference never gives you;
  2. runs text2video at the reference default operating point
     (time_size=12, context 12/overlap 4, video steps 10, guidance
     3.5/7.5, w_ind_noise 0.5 — reference scripts/inference/
     text2video.py:283-331) through the real CLI and writes the mp4.

Runnable the day checkpoints are available:

    MUSEV_UNET_CKPT=/ckpts/musev_referencenet/unet.safetensors \\
    MUSEV_REFNET_CKPT=/ckpts/musev_referencenet/referencenet.safetensors \\
    MUSEV_CLIP_VISION_CKPT=/ckpts/IP-Adapter/image_encoder.safetensors \\
    MUSEV_IP_ADAPTER_CKPT=/ckpts/IP-Adapter/ip-adapter_sd15.bin \\
    MUSEV_VAE_CKPT=/ckpts/vae/sd-vae-ft-mse.safetensors \\
    MUSEV_TEXT_CKPT=/ckpts/text_encoder.safetensors \\
    MUSEV_TOKENIZER=/ckpts/tokenizer \\
    python scripts/real_weights_smoke.py \\
        --image boy.png --prompt "(masterpiece, best quality)" \\
        --model_name musev_referencenet --out ./smoke_out

Every slot is optional — missing slots stay at random init and the report
says so loudly. --report-only skips the generation phase.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ENV_SLOTS = {
    "unet": "MUSEV_UNET_CKPT",
    "sd_base": "MUSEV_SD_BASE_CKPT",
    "vae": "MUSEV_VAE_CKPT",
    "text": "MUSEV_TEXT_CKPT",
    "referencenet": "MUSEV_REFNET_CKPT",
    "clip_vision": "MUSEV_CLIP_VISION_CKPT",
    "ip_adapter": "MUSEV_IP_ADAPTER_CKPT",
    "ip_adapter_face": "MUSEV_IP_FACE_CKPT",
    "controlnet": "MUSEV_CONTROLNET_CKPT",
}


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    p.add_argument("--image", type=str, required=True,
                   help="condition image (the reference's condition_images)")
    p.add_argument("--prompt", type=str,
                   default="(masterpiece, best quality, highres:1)")
    p.add_argument("--model_name", type=str, default="musev_referencenet",
                   choices=["musev", "musev_referencenet",
                            "musev_referencenet_pose"])
    p.add_argument("--out", type=str, default="./smoke_out")
    p.add_argument("--height", type=int, default=576)
    p.add_argument("--width", type=int, default=576)
    p.add_argument("--time_size", type=int, default=12)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dtype", type=str, default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--parallel", type=str, default="none",
                   choices=["none", "fp", "dp"])
    p.add_argument("--tokenizer_path", type=str,
                   default=os.environ.get("MUSEV_TOKENIZER"))
    p.add_argument("--report-only", action="store_true",
                   help="print the key report and exit (no model build)")
    p.add_argument("--tiny", action="store_true",
                   help="shrunk random-weight configs (drives the full "
                        "script path without real checkpoints; CI smoke)")
    p.add_argument("--time_overlap", type=int, default=4)
    p.add_argument("--video_num_inference_steps", type=int, default=10)
    p.add_argument("--strict", action="store_true",
                   help="fail the build when any provided checkpoint "
                        "leaves required sites unconsumed")
    for slot, env in ENV_SLOTS.items():
        p.add_argument(f"--{slot}_checkpoint", type=str,
                       default=os.environ.get(env))
    return p.parse_args(argv)


def _report_slot(slot, path, key_map, shape_tree, aliases=None):
    from musev_tpu.models import sd_weights as sw
    from musev_tpu.pipelines.loader import _load_state_dict

    expected = sw.export_key_names(list(key_map), shape_tree)
    if slot == "sd_base":
        # the T2I base only overwrites SPATIAL weights (merge_sd_base_
        # weights); reporting temporal/motion/ip keys as "missing" against
        # a plain 2D SD checkpoint would be false alarms on the tool's
        # primary use case
        expected = [k for k in expected
                    if "temp_" not in k and not k.startswith("frame_embedding")
                    and "transformer_in" not in k and "refer_emb" not in k
                    and "_ip." not in k and "to_k_ip" not in k
                    and "to_v_ip" not in k]
    sd = _load_state_dict(path)
    if slot in ("ip_adapter", "ip_adapter_face"):
        # .bin nesting: report the subdict key counts only (numbered-site
        # format, loaded by convert_ip_adapter_unet/convert_*_proj)
        parts = {k: len(v) for k, v in sd.items() if isinstance(v, dict)}
        print(f"  [{slot}] {path}")
        print(f"    nested subdicts: {parts or 'none (flat format)'}")
        return
    names = set(sd)
    if aliases:
        names = {sw._apply_aliases(k, aliases) for k in names}
    missing = [k for k in expected if k not in names]
    consumed = len(expected) - len(missing)
    unconsumed = sorted(names - set(expected))
    print(f"  [{slot}] {path}")
    print(f"    expected {len(expected)} keys: {consumed} supplied, "
          f"{len(missing)} MISSING (stay at random init)")
    for k in missing[:6]:
        print(f"      missing: {k}")
    if len(missing) > 6:
        print(f"      ... and {len(missing) - 6} more")
    print(f"    {len(unconsumed)} checkpoint keys unconsumed")
    for k in unconsumed[:6]:
        print(f"      unconsumed: {k}")
    if len(unconsumed) > 6:
        print(f"      ... and {len(unconsumed) - 6} more")


def main(argv=None):
    args = parse_args(argv)
    import dataclasses
    from functools import partial

    import jax

    from musev_tpu.configs.model_registry import get_model_preset
    from musev_tpu.models import sd_weights as sw
    from musev_tpu.models.clip_text import init_clip_text
    from musev_tpu.models.clip_vision import init_clip_vision
    from musev_tpu.models.controlnet import init_controlnet
    from musev_tpu.models.referencenet import init_referencenet
    from musev_tpu.models.unet3d import init_unet3d
    from musev_tpu.models.vae import init_vae

    preset = get_model_preset(args.model_name)
    if args.ip_adapter_face_checkpoint:
        preset.unet_cfg = dataclasses.replace(
            preset.unet_cfg, need_ip_adapter_face=True
        )

    key = jax.random.PRNGKey(0)

    def shapes(init, cfg):
        return jax.eval_shape(partial(init, key, cfg))

    print("== per-slot key report ==")
    any_slot = False
    slot_maps = {
        "unet": (sw.unet3d_key_map, init_unet3d, preset.unet_cfg, None),
        "sd_base": (sw.unet3d_key_map, init_unet3d, preset.unet_cfg, None),
        "vae": (sw.vae_key_map, init_vae, preset.vae_cfg,
                sw._VAE_LEGACY_ALIASES),
        "text": (sw.clip_text_key_map, init_clip_text, preset.text_cfg, None),
        "referencenet": (sw.referencenet_key_map, init_referencenet,
                         preset.referencenet_cfg, None),
        "clip_vision": (sw.clip_vision_key_map, init_clip_vision,
                        preset.clip_vision_cfg, None),
        "controlnet": (sw.controlnet_key_map, init_controlnet,
                       preset.controlnet_cfg, None),
        "ip_adapter": (None, None, None, None),
        "ip_adapter_face": (None, None, None, None),
    }
    for slot, (km, init, cfg, aliases) in slot_maps.items():
        path = getattr(args, f"{slot}_checkpoint")
        if not path:
            continue
        any_slot = True
        if not os.path.exists(path):
            print(f"  [{slot}] {path}  — FILE MISSING (random init)")
            continue
        if km is None:
            _report_slot(slot, path, [], None)
        elif cfg is None:
            print(f"  [{slot}] {path}  — preset {args.model_name} has no "
                  "such branch; checkpoint would be ignored")
        else:
            _report_slot(slot, path, km(cfg), shapes(init, cfg), aliases)
    if not any_slot:
        print("  (no checkpoints provided — every slot stays at random "
              "init; set the MUSEV_* env vars or --*_checkpoint flags)")
    if args.report_only:
        return

    # phase 2: generate through the real CLI at the reference defaults
    import csv
    import tempfile

    from musev_tpu.cli import text2video as cli

    os.makedirs(args.out, exist_ok=True)
    with tempfile.TemporaryDirectory() as td:
        task_csv = os.path.join(td, "task.csv")
        with open(task_csv, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=[
                "name", "prompt", "condition_images", "refer_image",
                "ipadapter_image", "height", "width", "seed",
            ])
            w.writeheader()
            w.writerow({
                "name": "real_weights_smoke",
                "prompt": args.prompt,
                "condition_images": args.image,
                "refer_image": args.image,
                "ipadapter_image": args.image,
                "height": args.height,
                "width": args.width,
                "seed": args.seed,
            })
        argv2 = [
            "--test_data_path", task_csv,
            "--output_dir", args.out,
            "--model_name", args.model_name,
            "--time_size", str(args.time_size),
            "--context_overlap", str(args.time_overlap),
            "--video_num_inference_steps",
            str(args.video_num_inference_steps),
            "--dtype", args.dtype,
            "--parallel", args.parallel,
            "--seed", str(args.seed),
        ]
        if args.tiny:
            argv2 += ["--tiny"]
        for slot in ENV_SLOTS:
            path = getattr(args, f"{slot}_checkpoint")
            if path:
                argv2 += [f"--{slot}_checkpoint", path]
        if args.tokenizer_path:
            argv2 += ["--tokenizer_path", args.tokenizer_path]
        if args.strict:
            argv2 += ["--strict_checkpoints"]
        print("== text2video ==")
        print("  argv:", " ".join(argv2))
        cli.main(argv2)
    print(f"== done: videos under {args.out} ==")


if __name__ == "__main__":
    main()
