"""video2video / pose2video CLI.

TPU-native counterpart of scripts/inference/video2video.py: reads a source
video (native libav reader), optionally treats it as the control middle
(``--video_is_middle``), runs the shot-chained VCPD pipeline per window, and
writes mp4.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from .text2video import _load_image, _round16


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="musev_tpu video2video")
    p.add_argument("--test_data_path", type=str, required=True)
    p.add_argument("--output_dir", type=str, default="./output")
    p.add_argument("--model_name", type=str, default="musev_referencenet_pose")
    p.add_argument("--unet_checkpoint", type=str, default=None)
    p.add_argument("--sd_base_checkpoint", type=str, default=None)
    p.add_argument("--vae_checkpoint", type=str, default=None)
    p.add_argument("--text_checkpoint", type=str, default=None)
    p.add_argument("--referencenet_checkpoint", type=str, default=None)
    p.add_argument("--clip_vision_checkpoint", type=str, default=None,
                   help="IP-Adapter image encoder (transformers "
                        "CLIPVisionModelWithProjection weights)")
    p.add_argument("--ip_adapter_checkpoint", type=str, default=None)
    p.add_argument("--controlnet_checkpoint", type=str, default=None)
    p.add_argument("--pose_guider_model_path", type=str, default=None,
                   help="Moore-AnimateAnyone PoseGuider checkpoint "
                        "(reference video2video.py:531-534)")
    p.add_argument("--tokenizer_path", type=str, default=None)
    p.add_argument("--time_size", type=int, default=12)
    p.add_argument("--fps", type=int, default=12)
    p.add_argument("--sample_rate", type=int, default=1)
    p.add_argument("--target_datas", type=str, default="all")
    p.add_argument("--height", type=int, default=None)
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--video_is_middle", action="store_true")
    p.add_argument("--controlnet_name", type=str, default="none",
                   help="condition processor: none|canny|dwpose* (with "
                        "--dwpose_det_onnx/--dwpose_pose_onnx)|<registered> "
                        "(reference controlnet_aux zoo; register custom via "
                        "musev_tpu.io.processors)")
    p.add_argument("--processor_onnx", action="append", default=None,
                   help="register an ONNX map processor: name=path (e.g. "
                        "depth=/models/midas.onnx hed=/models/hed.onnx); "
                        "kind inferred from the name "
                        "(mmcm controlnet.py:513 families)")
    p.add_argument("--dwpose_det_onnx", type=str,
                   default=os.environ.get("MUSEV_DWPOSE_DET"),
                   help="yolox person-detector onnx for the dwpose stage")
    p.add_argument("--dwpose_pose_onnx", type=str,
                   default=os.environ.get("MUSEV_DWPOSE_POSE"),
                   help="rtmpose whole-body onnx for the dwpose stage")
    p.add_argument("--sam_encoder_onnx", type=str,
                   default=os.environ.get("MUSEV_SAM_ENCODER"),
                   help="SAM image-encoder onnx for sam/mobile_sam")
    p.add_argument("--sam_decoder_onnx", type=str,
                   default=os.environ.get("MUSEV_SAM_DECODER"),
                   help="SAM mask-decoder onnx for sam/mobile_sam")
    p.add_argument("--face_detector_onnx", type=str,
                   default=os.environ.get("MUSEV_FACE_DET"),
                   help="yolox-format face detector onnx for face_detector")
    p.add_argument("--lora_path", action="append", default=None,
                   help="LoRA safetensors, repeatable; 'path' or 'path:scale'")
    p.add_argument("--textual_inversion", action="append", default=None,
                   help="textual-inversion embedding, repeatable; 'path' or "
                        "'path:trigger'")
    p.add_argument("--lcm_lora_path", type=str, default=None)
    p.add_argument("--lcm", action="store_true")
    p.add_argument("--need_hist_match", action="store_true")
    p.add_argument("--record_mid_video", action="store_true",
                   help="serial denoise: carry per-step tail latents/noises "
                        "between windows (predictor.py:1262-1265)")
    p.add_argument("--video_overlap", type=int, default=1)
    p.add_argument("--need_video2video", action="store_true")
    p.add_argument("--video_strength", type=float, default=0.8)
    p.add_argument("--n_vision_condition", type=int, default=1)
    p.add_argument("--noise_type", type=str, default="video_fusion")
    p.add_argument("--video_guidance_scale", type=float, default=3.5)
    p.add_argument("--guidance_scale", type=float, default=7.5)
    p.add_argument("--guidance_rescale", type=float, default=0.0)
    p.add_argument("--video_num_inference_steps", type=int, default=10)
    p.add_argument("--num_inference_steps", type=int, default=30)
    p.add_argument("--w_ind_noise", type=float, default=0.5)
    p.add_argument("--motion_speed", type=float, default=8.0)
    p.add_argument("--context_frames", type=int, default=12)
    p.add_argument("--context_overlap", type=int, default=4)
    p.add_argument("--controlnet_conditioning_scale", type=float, default=1.0)
    p.add_argument("--negative_prompt", type=str, default="V2")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--scheduler", type=str, default="euler")
    p.add_argument("--max_frames", type=int, default=None)
    p.add_argument("--strict_checkpoints", action="store_true",
                   help="raise (instead of log) when a provided checkpoint "
                        "is missing or leaves required param sites at "
                        "random init (loader strict mode)")
    p.add_argument("--dtype", type=str, default="float32")
    p.add_argument("--parallel", type=str, default="none",
                   choices=["none", "fp", "dp"],
                   help="multi-chip topology over all local devices: fp "
                        "shards every (window, cfg, frame) denoise row "
                        "(flagship, parallel/frame_parallel.py); dp shards "
                        "the window x CFG batch")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import jax.numpy as jnp

    from ..configs.model_registry import get_model_preset, resolve_negative_prompt
    from ..configs.tasks import load_tasks
    from ..io.video import VideoReader, native_available, write_video
    from ..pipelines.loader import build_models
    from ..pipelines.pipeline import MusevPipeline

    scheduler = "lcm" if (args.lcm or args.lcm_lora_path) else args.scheduler
    preset = get_model_preset(
        args.model_name,
        unet_checkpoint=args.unet_checkpoint,
        sd_base_checkpoint=args.sd_base_checkpoint,
        vae_checkpoint=args.vae_checkpoint,
        text_checkpoint=args.text_checkpoint,
        referencenet_checkpoint=args.referencenet_checkpoint,
        clip_vision_checkpoint=args.clip_vision_checkpoint,
        ip_adapter_checkpoint=args.ip_adapter_checkpoint,
        controlnet_checkpoint=args.controlnet_checkpoint,
        pose_guider_checkpoint=args.pose_guider_model_path,
        tokenizer_path=args.tokenizer_path,
        lora_checkpoints=args.lora_path,
        textual_inversion_checkpoints=args.textual_inversion,
        lcm_lora_checkpoint=args.lcm_lora_path,
    )
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    from ..parallel.mesh import cli_topology

    mesh_ctx, par_kwargs = cli_topology(args.parallel)
    models = build_models(preset, dtype=dtype, strict=args.strict_checkpoints)
    pipe = MusevPipeline(
        models, scheduler_name=scheduler, dtype=dtype, **par_kwargs
    )
    mesh_ctx.__enter__()

    for spec in args.processor_onnx or []:
        if "=" not in spec:
            raise SystemExit(f"--processor_onnx expects name=path, got {spec!r}")
        pname, ppath = spec.split("=", 1)
        from ..io.processors import register_onnx_processor

        register_onnx_processor(pname, ppath)
    if args.controlnet_name.startswith(("dwpose", "pose")):
        if args.dwpose_det_onnx and args.dwpose_pose_onnx:
            from ..io.dwpose import register_dwpose

            register_dwpose(args.dwpose_det_onnx, args.dwpose_pose_onnx)
        else:
            raise SystemExit(
                "--controlnet_name dwpose*/pose* needs --dwpose_det_onnx "
                "(yolox) and --dwpose_pose_onnx (rtmpose wholebody) onnx "
                "files, or MUSEV_DWPOSE_DET/MUSEV_DWPOSE_POSE env vars"
            )
    elif args.controlnet_name in ("sam", "mobile_sam"):
        if args.sam_encoder_onnx and args.sam_decoder_onnx:
            from ..io.sam import register_sam

            register_sam(args.sam_encoder_onnx, args.sam_decoder_onnx)
        else:
            raise SystemExit(
                "--controlnet_name sam/mobile_sam needs --sam_encoder_onnx "
                "and --sam_decoder_onnx (segment-anything ONNX export), or "
                "MUSEV_SAM_ENCODER/MUSEV_SAM_DECODER env vars"
            )
    elif args.controlnet_name == "face_detector":
        if args.face_detector_onnx:
            from ..io.sam import register_face_detector

            register_face_detector(args.face_detector_onnx)
        else:
            raise SystemExit(
                "--controlnet_name face_detector needs --face_detector_onnx "
                "(yolox-format detector), or the MUSEV_FACE_DET env var"
            )

    tasks = load_tasks(args.test_data_path)
    wanted = None if args.target_datas == "all" else set(args.target_datas.split(","))
    os.makedirs(args.output_dir, exist_ok=True)

    for task in tasks:
        name = task.get("name", "task")
        if wanted is not None and name not in wanted:
            continue
        video_path = task.get("video_path")
        if not video_path:
            continue
        prompt = task["prompt"]
        negative = resolve_negative_prompt(
            task.get("video_negative_prompt", args.negative_prompt)
        )
        reader = VideoReader(video_path)
        height = _round16(int(task.get("height", args.height or reader.height)))
        width = _round16(int(task.get("width", args.width or reader.width)))

        def stream_windows():
            from PIL import Image

            from ..io.video import PrefetchingWindows

            count = 0
            limit = args.max_frames or float("inf")
            for win in PrefetchingWindows(
                reader.windows(args.time_size, sample_rate=args.sample_rate)
            ):
                if count >= limit:
                    break
                if (height, width) != win.shape[1:3]:
                    win = np.stack(
                        [
                            np.asarray(Image.fromarray(f).resize((width, height)))
                            for f in win
                        ]
                    )
                count += win.shape[0]
                yield win
        cond_path = task.get("condition_images")
        cond = _load_image(cond_path, height, width) if cond_path else None
        refer_path = task.get("refer_image")
        refer = _load_image(refer_path, height, width)[:, 0] if refer_path else None

        from ..io.processors import get_processor

        processor = get_processor(args.controlnet_name)
        seed = int(task.get("seed", args.seed))
        res = pipe.video2video(
            prompt,
            stream_windows(),
            negative,
            controlnet_processor=processor,
            video_is_middle=bool(task.get("video_is_middle", args.video_is_middle)),
            need_video2video=args.need_video2video,
            video_strength=args.video_strength,
            condition_images=cond,
            time_size=args.time_size,
            n_vision_condition=args.n_vision_condition,
            height=height,
            width=width,
            video_num_inference_steps=args.video_num_inference_steps,
            num_inference_steps=args.num_inference_steps,
            video_guidance_scale=args.video_guidance_scale,
            guidance_scale=args.guidance_scale,
            guidance_rescale=args.guidance_rescale,
            context_frames=args.context_frames,
            context_overlap=args.context_overlap,
            noise_type=args.noise_type,
            w_ind_noise=args.w_ind_noise,
            motion_speed=args.motion_speed,
            controlnet_conditioning_scale=args.controlnet_conditioning_scale,
            refer_image=refer,
            seed=seed,
            need_hist_match=args.need_hist_match,
            record_mid_video=args.record_mid_video,
            video_overlap=args.video_overlap,
        )
        out_path = os.path.join(
            args.output_dir,
            f"{args.model_name}_{name}_w={width}_h={height}"
            f"_t={args.time_size}_s={seed}.mp4",
        )
        reader.close()
        frames_out = (res.videos[0] * 255).astype(np.uint8)
        if native_available():
            write_video(out_path, frames_out, fps=args.fps)
        else:  # fallback: png frames (parity with text2video)
            from PIL import Image

            base = out_path[:-4]
            os.makedirs(base, exist_ok=True)
            for i, f in enumerate(frames_out):
                Image.fromarray(f).save(f"{base}/{i:05d}.png")
            out_path = base
        print(f"wrote {out_path} ({frames_out.shape[0]} frames)")
    mesh_ctx.__exit__(None, None, None)


if __name__ == "__main__":
    main()
