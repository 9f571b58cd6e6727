"""Command-line interface.

Capability parity with `rvc-mlx-cli.py` / `rvc_cli.py` subcommand
surfaces: infer, batch_infer, tts, audio_analyzer, convert, preprocess,
extract, train, index, model_information, model_blender, download,
prerequisites. Network-dependent commands (tts/download/prerequisites)
degrade gracefully in air-gapped environments.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _f0_method(value: str) -> str:
    """f0 method choice incl. hybrid[a+b+...] combos (reference
    `rvc_cli.py:678-691` declares hybrids; we actually implement them)."""
    base = ["rmvpe", "crepe", "crepe-tiny", "fcpe", "dio", "pm", "harvest"]
    if value in base or (value.startswith("hybrid[") and value.endswith("]")):
        return value
    raise argparse.ArgumentTypeError(
        f"invalid f0 method {value!r}: choose from {base} or hybrid[a+b]")


def _add_infer_args(p):
    p.add_argument("--input_path", required=True)
    p.add_argument("--output_path", required=True)
    p.add_argument("--model_path", "--pth_path", dest="model_path", required=True)
    p.add_argument("--index_path", default=None)
    p.add_argument("--pitch", type=float, default=0)
    p.add_argument("--f0_method", default="rmvpe", type=_f0_method)
    p.add_argument("--index_rate", type=float, default=0.75)
    p.add_argument("--volume_envelope", type=float, default=1.0)
    p.add_argument("--protect", type=float, default=0.5)
    p.add_argument("--f0_autotune", action="store_true")
    p.add_argument("--f0_autotune_strength", type=float, default=1.0)
    p.add_argument("--f0_file", default=None,
                   help="text file with one f0 value per frame (overrides extraction)")
    p.add_argument("--proposed_pitch", action="store_true")
    p.add_argument("--proposed_pitch_threshold", type=float, default=155.0)
    p.add_argument("--sid", type=int, default=0)
    p.add_argument("--hubert_path", default=None)
    p.add_argument("--embedder_model", default="contentvec",
                   choices=["contentvec", "chinese-hubert-base",
                            "japanese-hubert-base", "korean-hubert-base",
                            "custom"])
    p.add_argument("--embedder_model_custom", default=None,
                   help="checkpoint path when --embedder_model custom")
    p.add_argument("--hop_length", type=int, default=160,
                   help="crepe analysis hop in 16 kHz samples")
    p.add_argument("--split_audio", action="store_true")
    p.add_argument("--clean_audio", action="store_true")
    p.add_argument("--clean_strength", type=float, default=0.5)
    p.add_argument("--export_format", default="WAV",
                   choices=["WAV", "MP3", "FLAC", "OGG", "M4A"])
    p.add_argument("--formant_shifting", action="store_true")
    p.add_argument("--formant_qfrency", type=float, default=1.0)
    p.add_argument("--formant_timbre", type=float, default=1.0)
    p.add_argument("--post_process", action="store_true")
    # pedalboard-parity FX flag set (reference rvc_cli.py infer flags,
    # incl. --pitch_shift/--pitch_shift_semitones at rvc_cli.py:78,93)
    for flag in ("reverb", "pitch_shift", "limiter", "gain", "distortion",
                 "chorus", "bitcrush", "clipping", "compressor", "delay"):
        p.add_argument(f"--{flag}", action="store_true")
    for flag, d in (
        ("pitch_shift_semitones", 0.0),
        ("reverb_room_size", 0.5), ("reverb_damping", 0.5),
        ("reverb_wet_level", 0.33), ("reverb_dry_level", 0.4),
        ("reverb_width", 1.0), ("reverb_freeze_mode", 0.0),
        ("limiter_threshold", -6.0), ("limiter_release", 50.0),
        ("gain_db", 0.0), ("distortion_gain", 25.0),
        ("chorus_rate", 1.0), ("chorus_depth", 0.25), ("chorus_delay", 7.0),
        ("chorus_feedback", 0.0), ("chorus_mix", 0.5),
        ("bitcrush_bit_depth", 8.0), ("clipping_threshold", 0.0),
        ("compressor_threshold", 0.0), ("compressor_ratio", 1.0),
        ("compressor_attack", 1.0), ("compressor_release", 100.0),
        ("delay_seconds", 0.5), ("delay_feedback", 0.0), ("delay_mix", 0.5),
    ):
        p.add_argument(f"--{flag}", type=float, default=d)


_FX_KEYS = (
    "reverb", "pitch_shift", "pitch_shift_semitones", "limiter", "gain",
    "distortion", "chorus", "bitcrush",
    "clipping", "compressor", "delay",
    "reverb_room_size", "reverb_damping", "reverb_wet_level",
    "reverb_dry_level", "reverb_width", "reverb_freeze_mode",
    "limiter_threshold", "limiter_release", "gain_db", "distortion_gain",
    "chorus_rate", "chorus_depth", "chorus_delay", "chorus_feedback",
    "chorus_mix", "bitcrush_bit_depth", "clipping_threshold",
    "compressor_threshold", "compressor_ratio", "compressor_attack",
    "compressor_release", "delay_seconds", "delay_feedback", "delay_mix",
)


def _infer_kwargs(args):
    """Shared CLI->RVC.infer kwarg mapping for infer/batch_infer/tts."""
    input_f0 = None
    if getattr(args, "f0_file", None):
        import numpy as np

        input_f0 = np.loadtxt(args.f0_file, dtype=np.float32).ravel()
    kw = dict(
        sid=args.sid, pitch=args.pitch, f0_method=args.f0_method,
        index_rate=args.index_rate, volume_envelope=args.volume_envelope,
        protect=args.protect, f0_autotune=args.f0_autotune,
        f0_autotune_strength=args.f0_autotune_strength,
        input_f0=input_f0,
        proposed_pitch=args.proposed_pitch,
        proposed_pitch_threshold=args.proposed_pitch_threshold,
        split_audio=args.split_audio, clean_audio=args.clean_audio,
        clean_strength=args.clean_strength,
        formant_shifting=args.formant_shifting,
        formant_qfrency=args.formant_qfrency,
        formant_timbre=args.formant_timbre,
        post_process=args.post_process,
        export_format=args.export_format,
        f0_hop_length=args.hop_length,
    )
    kw.update({k: getattr(args, k) for k in _FX_KEYS})
    return kw


def _load_rvc(args):
    from rvc_tpu.api import RVC

    return RVC(model_path=args.model_path, hubert_path=args.hubert_path,
               index_path=args.index_path,
               embedder_model=getattr(args, "embedder_model", "contentvec"),
               embedder_model_custom=getattr(args, "embedder_model_custom", None))


def cmd_infer(args):
    rvc = _load_rvc(args)
    out = rvc.infer_file(args.input_path, args.output_path,
                         **_infer_kwargs(args))
    print(f"wrote {out}")


def cmd_batch_infer(args):
    rvc = _load_rvc(args)
    os.makedirs(args.output_folder, exist_ok=True)
    exts = (".wav", ".flac", ".mp3", ".ogg")
    files = [f for f in sorted(os.listdir(args.input_folder))
             if f.lower().endswith(exts)]
    for f in files:
        out = os.path.join(args.output_folder,
                           os.path.splitext(f)[0] + "_output.wav")
        rvc.infer_file(os.path.join(args.input_folder, f), out,
                       **_infer_kwargs(args))
        print(f"wrote {out}")
    print(f"{len(files)} files converted")


def cmd_tts(args):
    try:
        import edge_tts  # noqa: F401
    except ImportError:
        print("edge-tts is not installed (network TTS frontend unavailable); "
              "provide a wav with `infer` instead.", file=sys.stderr)
        sys.exit(2)
    # --tts_file: read the text from a file (reference rvc_cli.py tts)
    text = args.tts_text
    if getattr(args, "tts_file", None):
        with open(args.tts_file) as f:
            text = f.read().strip()
    if not text:
        print("no TTS text: pass --tts_text or --tts_file", file=sys.stderr)
        sys.exit(2)
    from rvc_tpu.tools.tts import synthesize

    synthesize(text, args.tts_voice, args.tts_rate, args.output_tts_path)
    rvc = _load_rvc(args)
    rvc.infer_file(args.output_tts_path, args.output_path,
                   **_infer_kwargs(args))
    print(f"wrote {args.output_path}")


def cmd_tensorboard(args):
    """Reference `rvc_cli.py tensorboard` parity: launch tensorboard when
    installed; otherwise plot the JSONL tracker curves."""
    try:
        import subprocess

        import tensorboard  # noqa: F401

        subprocess.run([sys.executable, "-m", "tensorboard.main",
                        "--logdir", args.logs_path], check=True)
        return
    except Exception as e:  # not installed, or launcher fails in-env
        print(f"tensorboard unavailable ({e.__class__.__name__}); "
              "falling back to JSONL curve plots", file=sys.stderr)
    import glob

    from rvc_tpu.tools.plot_logs import plot

    logs = sorted(glob.glob(os.path.join(args.logs_path, "**", "*.jsonl"),
                            recursive=True))
    if os.path.isfile(args.logs_path):
        logs = [args.logs_path]
    if not logs:
        print(f"no tensorboard and no .jsonl tracker logs under "
              f"{args.logs_path!r}", file=sys.stderr)
        sys.exit(2)
    for log in logs:
        print(plot(log, args.out_path))


def cmd_audio_analyzer(args):
    from rvc_tpu.tools.model_tools import analyze_audio

    print(json.dumps(analyze_audio(args.input_path, args.plot_path),
                     indent=2))


def cmd_convert(args):
    from rvc_tpu.tools.model_tools import convert_model

    out = convert_model(args.pth_path, args.output_path)
    print(f"wrote {out}")


def cmd_model_information(args):
    from rvc_tpu.tools.model_tools import model_information

    print(json.dumps(model_information(args.model_path), indent=2, default=str))


def cmd_model_blender(args):
    from rvc_tpu.tools.model_tools import blend_models

    out = blend_models(args.pth_path_1, args.pth_path_2, args.ratio,
                       args.output_path)
    print(f"wrote {out}")


def cmd_preprocess(args):
    from rvc_tpu.preprocess import AudioPreprocessor

    exp_dir = os.path.join(args.logs_dir, args.model_name)
    os.makedirs(exp_dir, exist_ok=True)
    pre = AudioPreprocessor(exp_dir, args.sample_rate)
    n = pre.process_directory(args.dataset_path, args.cut_preprocess,
                              cpu_cores=args.cpu_cores,
                              process_effects=args.process_effects,
                              chunk_len=args.chunk_len,
                              overlap_len=args.overlap_len,
                              noise_reduction=args.noise_reduction,
                              noise_reduction_strength=args.noise_reduction_strength)
    print(f"{n} segments written to {exp_dir}")


def cmd_extract(args):
    from rvc_tpu.configs import get_config
    from rvc_tpu.preprocess import FeatureExtractor, DatasetBuilder
    from rvc_tpu.utils.embedders import resolve_embedder

    exp_dir = os.path.join(args.logs_dir, args.model_name)
    cfg = get_config(args.sample_rate)
    hubert_path = args.hubert_path or resolve_embedder(
        args.embedder_model, args.embedder_model_custom)
    fe = FeatureExtractor(exp_dir, cfg, f0_method=args.f0_method,
                          f0_hop_length=args.hop_length,
                          hubert_path=hubert_path)
    n = fe.process_all(batch_size=args.batch_size, cpu_cores=args.cpu_cores)
    builder = DatasetBuilder(exp_dir)
    train_rows, val_rows = builder.build()
    if args.include_mutes > 0:
        # mute-sample padding per speaker (`preparing_files.py:58-67`)
        train_rows = train_rows + builder.add_mutes(
            cfg, args.include_mutes, feature_extractor=fe)
    builder.write_filelist(os.path.join(exp_dir, "filelist_train.txt"), train_rows)
    builder.write_filelist(os.path.join(exp_dir, "filelist_val.txt"), val_rows)
    # experiment metadata (reference `preparing_files.py` model_info.json)
    sids = sorted({r["sid"] for r in train_rows + val_rows})
    with open(os.path.join(exp_dir, "model_info.json"), "w") as f:
        # --hubert_path overrides the named embedder; record what was
        # actually used, not the (ignored) --embedder_model name
        embedder = args.embedder_model if not args.hubert_path else "custom"
        json.dump({"speakers_id": len(sids) or 1, "sample_rate": args.sample_rate,
                   "f0_method": args.f0_method,
                   "embedder_model": embedder,
                   "embedder_model_custom": args.hubert_path or args.embedder_model_custom,
                   "n_train": len(train_rows), "n_val": len(val_rows)}, f, indent=2)
    print(f"{n} segments extracted; {len(train_rows)} train / {len(val_rows)} val")


def _default_pretrains(args):
    """Stock pretrain paths for --pretrained, matching the downloader's
    local layout (`tools/download.py:FOLDER_MAPPING`)."""
    from rvc_tpu.utils.embedders import models_dir

    if args.vocoder == "RefineGAN":
        family = "refinegan"
    elif args.pretrain == "titan":
        family = "titan"
    else:
        family = "hifi-gan"
    srk = f"{args.sample_rate // 1000}k"
    root = os.path.join(models_dir(), "pretraineds", family)
    g = os.path.join(root, f"f0G{srk}.pth")
    d = os.path.join(root, f"f0D{srk}.pth")
    missing = [p for p in (g, d) if not os.path.exists(p)]
    if missing:
        print(f"warning: --pretrained requested but {missing} not found; "
              f"fetch with `rvc-tpu prerequisites` — training from "
              f"scratch", file=sys.stderr)
        return None, None
    return g, d


def cmd_train(args):
    from rvc_tpu.configs import get_config
    from rvc_tpu.preprocess import DatasetBuilder
    from rvc_tpu.train.data import DataLoader, RVCDataset
    from rvc_tpu.train.trainer import RVCTrainer

    # multi-host bootstrap (TPU-native analog of the reference's per-GPU
    # mp.Process + dist.init_process_group, `rvc/train/train.py:163-343`):
    # jax.distributed rendezvous, then a (data x model) mesh spanning all
    # processes; each host's loader takes a strided shard of the batches
    from rvc_tpu.parallel.distributed import (
        global_mesh, host_shard_info, initialize)

    info = initialize(args.coordinator, args.num_hosts, args.host_id)
    shard = host_shard_info()
    mesh = None
    import jax

    if args.mesh_model > 1 or len(jax.devices()) > 1:
        mesh = global_mesh(n_model=args.mesh_model)
    if shard["host_id"] == 0 and (mesh is not None or shard["num_hosts"] > 1):
        print(f"distributed: {info}; mesh="
              f"{dict(mesh.shape) if mesh is not None else None}; "
              f"hosts={shard['num_hosts']}")

    exp_dir = os.path.join(args.logs_dir, args.model_name)
    overrides = json.loads(args.config_overrides) if args.config_overrides else {}
    cfg = get_config(args.sample_rate, train_batch_size=args.batch_size,
                     train_warmup_epochs=args.warmup_epochs,
                     train_d_step_per_g_step=args.d_step_per_g_step,
                     model_vocoder=args.vocoder,
                     model_checkpointing=args.checkpointing,
                     **overrides)
    rows = DatasetBuilder.read_filelist(os.path.join(exp_dir, "filelist_train.txt"))
    # reattach n_frames for bucketing
    import numpy as np

    for r in rows:
        if "spec" in r and os.path.exists(r["spec"]):
            r["n_frames"] = int(np.load(r["spec"], mmap_mode="r").shape[0])
    batch_size = args.batch_size
    if args.auto_batch_size:
        from rvc_tpu.train.overtraining import calculate_recommended_batch_size

        minutes = sum(r.get("n_frames", 0) for r in rows) \
            * cfg.data.hop_length / cfg.data.sample_rate / 60.0
        batch_size = calculate_recommended_batch_size(minutes)
        print(f"auto batch size: {batch_size} ({minutes:.1f} min of audio)")
    ckpt_dir = os.path.join(exp_dir, "ckpt")
    if args.cleanup and shard["host_id"] == 0 and os.path.isdir(ckpt_dir):
        # fresh run requested: drop stale checkpoints (reference
        # `rvc_cli.py --cleanup` wipes the experiment's train state)
        import shutil

        shutil.rmtree(ckpt_dir)
    ds = RVCDataset(rows, cfg.data.hop_length)
    loader = DataLoader(ds, batch_size, num_hosts=shard["num_hosts"],
                        host_id=shard["host_id"],
                        shuffle=not args.no_shuffle)
    trainer = RVCTrainer(cfg, loader, checkpoint_dir=ckpt_dir,
                         use_overtraining_detector=args.overtraining_detector,
                         overtraining_threshold=args.overtraining_threshold,
                         overtraining_patience=args.overtraining_patience,
                         save_only_latest=args.save_only_latest,
                         save_every_weights=args.save_every_weights,
                         cache_data_on_device=args.cache_data_in_gpu,
                         model_name=args.model_name,
                         mesh=mesh, use_aim=args.use_aim)
    g_path, d_path = args.g_pretrained_path, args.d_pretrained_path
    if args.custom_pretrained and not (g_path or d_path):
        raise SystemExit("--custom_pretrained requires --g_pretrained_path/"
                         "--d_pretrained_path")
    if args.pretrained and not (g_path or d_path):
        g_path, d_path = _default_pretrains(args)
    if g_path or d_path:
        trainer.load_pretrained(g_path, d_path)
    result = trainer.train(args.total_epoch, save_every=args.save_every_epoch)
    # EVERY host enters the export: fetching mesh-sharded params is a
    # collective (trainer._host_tree) — a main-only call would hang the
    # main host once the others exit. Only host 0 writes the file.
    final = trainer.export_inference_model(
        os.path.join(exp_dir, f"{args.model_name}.safetensors"))
    if shard["host_id"] != 0:
        final = None
    if shard["host_id"] == 0:
        if args.index_algorithm:
            # an index-build failure (e.g. empty features dir) must not
            # swallow the training summary of a completed run
            try:
                cmd_index(args)
            except SystemExit as e:
                print(f"warning: post-training index build failed "
                      f"(exit {e.code}); run `rvc-tpu index` manually",
                      file=sys.stderr)
            except Exception as e:  # e.g. missing features dir
                print(f"warning: post-training index build failed "
                      f"({e.__class__.__name__}: {e}); run "
                      f"`rvc-tpu index` manually", file=sys.stderr)
    print(json.dumps({"epochs_run": result["epochs_run"],
                      "best_loss": result["best_loss"], "model": final,
                      "host": shard["host_id"]}))


def cmd_index(args):
    import numpy as np

    from rvc_tpu.retrieval import build_index, write_faiss_index

    exp_dir = os.path.join(args.logs_dir, args.model_name)
    feat_dir = os.path.join(exp_dir, "features")
    feats = [np.load(os.path.join(feat_dir, f))
             for f in sorted(os.listdir(feat_dir)) if f.endswith(".npy")]
    if not feats:
        print("no features found; run extract first", file=sys.stderr)
        sys.exit(2)
    all_feats = np.concatenate(feats, axis=0)
    rng = np.random.default_rng(0)
    rng.shuffle(all_feats)
    algo = getattr(args, "index_algorithm", "Auto") or "Auto"
    compress = algo == "KMeans" or (algo == "Auto" and len(all_feats) > 200_000)
    if compress and len(all_feats) > 256:
        # compress to <=10k centroids before indexing (reference
        # MiniBatchKMeans branch, `rvc/train/process/extract_index.py`);
        # kmeans_fit bounds device memory to O(chunk*K) at this scale
        from rvc_tpu.retrieval.ivf import kmeans_fit

        k = min(10_000, len(all_feats) // 4)
        init = all_feats[rng.choice(len(all_feats), k, replace=False)]
        all_feats = kmeans_fit(all_feats, init, k)
    idx = build_index(all_feats)
    out = os.path.join(exp_dir, f"{args.model_name}.index")
    write_faiss_index(idx, out)
    print(f"wrote {out} ({idx.ntotal} vectors, {idx.nlist} lists)")


def cmd_download(args):
    from rvc_tpu.tools.download import download_model

    out = download_model(args.model_link, args.output_dir)
    print(f"downloaded to {out}")


def cmd_prerequisites(args):
    from rvc_tpu.tools.download import download_prerequisites

    download_prerequisites(pretraineds=args.pretraineds_hifigan,
                           models=args.models, titan=args.titan,
                           refinegan=args.refinegan,
                           embedders=args.embedders)


def cmd_serve(args):
    """Start a realtime conversion server (websocket speaking the
    reference ws-audio client protocol, or the length-prefixed TCP
    protocol)."""
    from rvc_tpu.api import RVC

    rvc = RVC(model_path=args.model_path, hubert_path=args.hubert_path,
              index_path=args.index_path,
              embedder_model=args.embedder_model,
              embedder_model_custom=args.embedder_model_custom)
    if args.protocol == "ws":
        from rvc_tpu.realtime.server import RealtimeWebSocketServer

        server = RealtimeWebSocketServer(rvc=rvc, host=args.host,
                                         port=args.port)
        if args.webui:
            # browser client app (the reference's native GUI analog):
            # mic -> ws -> playback with session controls
            from rvc_tpu.realtime.webui import WebUIServer

            ui = WebUIServer(host=args.host, port=args.webui_port,
                             ws_url=f"ws://{args.host}:{args.port}")
            ui.serve_in_thread()
            print(f"web client on http://{args.host}:{args.webui_port}")
    else:
        from rvc_tpu.realtime.core import VoiceChanger
        from rvc_tpu.realtime.server import RealtimeSocketServer

        # per-connection engines: SOLA/pitch state is per-stream, so a
        # shared VoiceChanger would corrupt concurrent TCP clients
        def vc_factory():
            return VoiceChanger(rvc, read_chunk_size=args.chunk_size,
                                f0_method=args.f0_method, sid=args.sid)

        server = RealtimeSocketServer(vc_factory=vc_factory, host=args.host,
                                      port=args.port)
    print(f"serving {args.protocol} on {args.host}:{args.port} "
          f"(ctrl-c to stop)")
    import asyncio

    try:
        asyncio.run(server.serve())
    except KeyboardInterrupt:
        print("stopped")


def main(argv=None):
    parser = argparse.ArgumentParser("rvc-tpu", description=__doc__)
    # JAX_PLATFORMS in the environment is too late on images whose
    # sitecustomize pre-imports jax; this flag works regardless
    parser.add_argument("--device", choices=["tpu", "cpu"], default=None,
                        help="force the compute backend (default: best available)")
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("infer")
    _add_infer_args(p)
    p.set_defaults(fn=cmd_infer)

    p = sub.add_parser("batch_infer")
    _add_infer_args(p)
    # batch mode replaces single paths
    for a in list(p._actions):
        if a.dest in ("input_path", "output_path"):
            a.required = False
    p.add_argument("--input_folder", required=True)
    p.add_argument("--output_folder", required=True)
    p.set_defaults(fn=cmd_batch_infer, input_path=None, output_path=None)

    p = sub.add_parser("tts")
    _add_infer_args(p)
    for a in list(p._actions):
        if a.dest == "input_path":
            a.required = False
    p.add_argument("--tts_text", default=None)
    p.add_argument("--tts_file", default=None,
                   help="read the text to synthesize from a file")
    p.add_argument("--tts_voice", default="en-US-AriaNeural")
    p.add_argument("--tts_rate", type=int, default=0)
    p.add_argument("--output_tts_path", default="tts_output.wav")
    p.set_defaults(fn=cmd_tts, input_path=None)

    p = sub.add_parser("audio_analyzer")
    p.add_argument("--input_path", required=True)
    p.add_argument("--plot_path", default="logs/audio_analysis.png",
                   help="3-panel analysis figure output (reference "
                        "analyzer.py default; empty string disables)")
    p.set_defaults(fn=cmd_audio_analyzer)

    p = sub.add_parser("convert")
    p.add_argument("--pth_path", required=True)
    p.add_argument("--output_path", default=None)
    p.set_defaults(fn=cmd_convert)

    p = sub.add_parser("model_information")
    p.add_argument("--model_path", required=True)
    p.set_defaults(fn=cmd_model_information)

    p = sub.add_parser("model_blender")
    p.add_argument("--pth_path_1", required=True)
    p.add_argument("--pth_path_2", required=True)
    p.add_argument("--ratio", type=float, default=0.5)
    p.add_argument("--output_path", default="blended.safetensors")
    p.set_defaults(fn=cmd_model_blender)

    p = sub.add_parser("preprocess")
    p.add_argument("--model_name", required=True)
    p.add_argument("--dataset_path", required=True)
    p.add_argument("--sample_rate", type=int, default=48000,
                   choices=[32000, 40000, 48000])
    p.add_argument("--cut_preprocess", default="Automatic",
                   choices=["Skip", "Simple", "Automatic"])
    p.add_argument("--process_effects", action="store_true", default=True)
    p.add_argument("--chunk_len", type=float, default=3.0)
    p.add_argument("--overlap_len", type=float, default=0.3)
    p.add_argument("--cpu_cores", type=int, default=os.cpu_count() or 1,
                   help="file-level preprocessing workers "
                        "(reference preprocess.py:271)")
    p.add_argument("--noise_reduction", action="store_true")
    p.add_argument("--noise_reduction_strength", type=float, default=0.7)
    p.add_argument("--logs_dir", default="logs")
    p.set_defaults(fn=cmd_preprocess)

    p = sub.add_parser("extract")
    p.add_argument("--model_name", required=True)
    p.add_argument("--sample_rate", type=int, default=48000)
    p.add_argument("--f0_method", default="rmvpe", type=_f0_method)
    p.add_argument("--hop_length", type=int, default=160,
                   help="crepe analysis hop in 16 kHz samples")
    p.add_argument("--batch_size", type=int, default=8,
                   help="same-length segments batched per device dispatch")
    p.add_argument("--cpu_cores", type=int, default=None,
                   help="parallel host-side audio decode workers")
    p.add_argument("--include_mutes", type=int, default=2,
                   help="mute samples appended per speaker (0 disables)")
    p.add_argument("--hubert_path", default=None)
    p.add_argument("--embedder_model", default="contentvec",
                   choices=["contentvec", "chinese-hubert-base",
                            "japanese-hubert-base", "korean-hubert-base",
                            "custom"])
    p.add_argument("--embedder_model_custom", default=None)
    p.add_argument("--gpu", default=None,
                   help="accepted for reference-CLI compat; devices come "
                        "from JAX (ignored)")
    p.add_argument("--logs_dir", default="logs")
    p.set_defaults(fn=cmd_extract)

    p = sub.add_parser("train")
    p.add_argument("--model_name", required=True)
    p.add_argument("--sample_rate", type=int, default=48000)
    p.add_argument("--total_epoch", type=int, default=300)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--save_every_epoch", type=int, default=10)
    p.add_argument("--warmup_epochs", type=int, default=0)
    p.add_argument("--g_pretrained_path", default=None)
    p.add_argument("--d_pretrained_path", default=None)
    p.add_argument("--pretrained", action="store_true",
                   help="load the stock pretrains matching --vocoder/"
                        "--sample_rate from models/pretraineds")
    p.add_argument("--custom_pretrained", action="store_true",
                   help="use --g_pretrained_path/--d_pretrained_path")
    p.add_argument("--pretrain", default="base", choices=["base", "titan"],
                   help="pretrain family for --pretrained")
    p.add_argument("--cleanup", action="store_true",
                   help="delete stale checkpoints in the experiment dir "
                        "before training")
    p.add_argument("--index_algorithm", default=None,
                   choices=["Auto", "Faiss", "KMeans"],
                   help="also build the retrieval index after training")
    p.add_argument("--auto_batch_size", action="store_true",
                   help="pick the batch size from dataset length")
    p.add_argument("--gpu", default=None,
                   help="accepted for reference-CLI compat; devices come "
                        "from JAX (ignored)")
    p.add_argument("--overtraining_detector", action="store_true")
    p.add_argument("--overtraining_threshold", type=int, default=50)
    p.add_argument("--overtraining_patience", type=int, default=10)
    p.add_argument("--logs_dir", default="logs")
    p.add_argument("--save_only_latest", action="store_true")
    p.add_argument("--save_every_weights", action="store_true")
    p.add_argument("--cache_data_in_gpu", action="store_true",
                   help="keep collated batches device-resident across epochs")
    p.add_argument("--d_step_per_g_step", type=int, default=1)
    p.add_argument("--vocoder", default="HiFi-GAN",
                   choices=["HiFi-GAN", "MRF HiFi-GAN", "RefineGAN"])
    p.add_argument("--checkpointing", action="store_true",
                   help="rematerialize the decoder (activation checkpointing)")
    p.add_argument("--use_aim", action="store_true",
                   help="track with Aim (raises if aim is not installed)")
    # distributed flags (reference spawns one worker per GPU,
    # `rvc/train/train.py:163-230`; here: jax.distributed + device mesh)
    p.add_argument("--coordinator", default=None,
                   help="host:port of process 0 for multi-host training")
    p.add_argument("--num_hosts", type=int, default=None)
    p.add_argument("--host_id", type=int, default=None)
    p.add_argument("--mesh_model", type=int, default=1,
                   help="model-parallel axis size (data axis gets the rest)")
    p.add_argument("--config_overrides", default=None,
                   help='JSON dict of get_config kwargs, e.g. '
                        '\'{"model_n_layers": 2}\'')
    p.add_argument("--no_shuffle", action="store_true",
                   help="deterministic batch order (debug/repro runs)")
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("index")
    p.add_argument("--model_name", required=True)
    p.add_argument("--logs_dir", default="logs")
    p.add_argument("--index_algorithm", default="Auto",
                   choices=["Auto", "Faiss", "KMeans"])
    p.set_defaults(fn=cmd_index)

    p = sub.add_parser("download")
    p.add_argument("--model_link", required=True)
    p.add_argument("--output_dir", default="models")
    p.set_defaults(fn=cmd_download)

    p = sub.add_parser("prerequisites")
    p.add_argument("--pretraineds_hifigan", action="store_true")
    p.add_argument("--models", action="store_true", default=True)
    p.add_argument("--titan", action="store_true",
                   help="TITAN community pretrains (reference --titan)")
    p.add_argument("--refinegan", action="store_true",
                   help="RefineGAN pretrains")
    p.add_argument("--embedders", action="store_true",
                   help="language-specialized HuBERT embedders")
    p.add_argument("--exe", action="store_true",
                   help="accepted for reference-CLI compat (Windows "
                        "ffmpeg executables; n/a here — ignored)")
    p.set_defaults(fn=cmd_prerequisites)

    p = sub.add_parser(
        "serve",
        help="realtime conversion server (ws-audio or TCP protocol)")
    p.add_argument("--model_path", required=True)
    p.add_argument("--index_path", default=None)
    p.add_argument("--hubert_path", default=None)
    p.add_argument("--embedder_model", default="contentvec",
                   choices=["contentvec", "chinese-hubert-base",
                            "japanese-hubert-base", "korean-hubert-base",
                            "custom"])
    p.add_argument("--embedder_model_custom", default=None)
    p.add_argument("--protocol", default="ws", choices=["ws", "tcp"])
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=6006)
    p.add_argument("--chunk_size", type=int, default=192,
                   help="TCP protocol block size (x128 samples @48 kHz)")
    p.add_argument("--f0_method", default="rmvpe", type=_f0_method)
    p.add_argument("--sid", type=int, default=0)
    p.add_argument("--webui", action="store_true",
                   help="also serve the browser client app (ws protocol)")
    p.add_argument("--webui_port", type=int, default=6007)
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser(
        "tensorboard",
        help="launch tensorboard on the logs dir, or render the JSONL "
             "tracker curves to a PNG when tensorboard is unavailable")
    p.add_argument("--logs_path", default="logs")
    p.add_argument("--out_path", default=None)
    p.set_defaults(fn=cmd_tensorboard)

    args = parser.parse_args(argv)
    if args.device:
        import jax

        jax.config.update("jax_platforms", args.device)
    args.fn(args)


if __name__ == "__main__":
    main()
