"""Convert the reference's torch checkpoints into a TAIR-TPU params .npz.

Replicates initialize.load_model's checkpoint surgery
(/root/reference/initialize.py:80-168): SD-2.1 bundle split into
unet/vae/clip, ControlNet from the DiffBIR checkpoint (or initialized from
the converted UNet with zero-padded hint channels), SwinIR with module.
prefix strip, TESTR detectron2 bundle.

Usage:
  python convert_weights.py --out weights/tair_tpu.npz \
      --sd weights/sd2.1-base-zsnr-laionaes5.ckpt \
      --controlnet weights/DiffBIR_v2.1.pt \
      --swinir weights/realesrgan_s4_swinir_100k.pth \
      --testr weights/pretrain_testr_R50_polygon.pth
Any subset may be given; missing modules keep their random init.
"""

from __future__ import annotations

import argparse


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", required=True)
    parser.add_argument("--sd", default=None, help="SD-2.1 bundle ckpt")
    parser.add_argument("--controlnet", default=None, help="DiffBIR ControlNet")
    parser.add_argument("--swinir", default=None)
    parser.add_argument("--testr", default=None)
    parser.add_argument(
        "--bsrnet", default=None,
        help="BSRNet/BSRGAN RRDBNet ckpt -> <out>_bsrnet.npz (DiffBIR "
             "BSRNetPipeline cleaner)",
    )
    parser.add_argument(
        "--scunet", default=None,
        help="SCUNet ckpt -> <out>_scunet.npz (DiffBIR SCUNetPipeline cleaner)",
    )
    parser.add_argument(
        "--controlnet-from-unet", action="store_true",
        help="init ControlNet from the converted UNet (zero-padded hint conv)",
    )
    args = parser.parse_args()

    import jax

    from tair_tpu.pipeline import build_default_model
    from tair_tpu.train.checkpoint import save_params
    from tair_tpu.weights.convert import (
        _cast_like,
        controlnet_from_unet,
        convert_controlnet,
        convert_swinir,
        convert_testr,
        load_pretrained_sd_bundle,
        load_torch_file,
    )

    model = build_default_model()
    params = model.init(jax.random.PRNGKey(0))

    if args.sd:
        sd = load_torch_file(args.sd)
        params = load_pretrained_sd_bundle(params, sd, model)
        print(f"loaded SD bundle from {args.sd}")

    if args.controlnet:
        cn = load_torch_file(args.controlnet)
        converted, reader = convert_controlnet(cn, model.cldm.controlnet.cfg)
        params["controlnet"] = _cast_like(converted, params["controlnet"])
        print(f"loaded ControlNet from {args.controlnet} "
              f"(missing={len(reader.missing)}, unused={len(reader.unused())})")
    elif args.controlnet_from_unet:
        params["controlnet"] = controlnet_from_unet(
            params["unet"], params["controlnet"]
        )
        print("initialized ControlNet from UNet weights (hint channels zeroed)")

    if args.swinir:
        sw = load_torch_file(args.swinir)
        converted, reader = convert_swinir(sw, model.swinir.cfg)
        params["swinir"] = _cast_like(converted, params["swinir"])
        print(f"loaded SwinIR from {args.swinir} (missing={len(reader.missing)})")

    if args.testr:
        ts = load_torch_file(args.testr)
        converted, reader = convert_testr(ts, model.testr.cfg)
        params["testr"] = _cast_like(converted, params["testr"])
        print(f"loaded TESTR from {args.testr} (missing={len(reader.missing)})")

    if args.bsrnet or args.scunet:
        import os

        from tair_tpu.models.cleaners import (
            RRDBNet,
            RRDBNetConfig,
            SCUNet,
            SCUNetConfig,
        )
        from tair_tpu.weights.convert import convert_bsrnet, convert_scunet

        stem = os.path.splitext(args.out)[0]
        if args.bsrnet:
            converted, reader = convert_bsrnet(
                load_torch_file(args.bsrnet), RRDBNetConfig()
            )
            save_params(f"{stem}_bsrnet.npz", converted)
            print(f"wrote {stem}_bsrnet.npz (missing={len(reader.missing)})")
        if args.scunet:
            converted, reader = convert_scunet(
                load_torch_file(args.scunet), SCUNetConfig()
            )
            save_params(f"{stem}_scunet.npz", converted)
            print(f"wrote {stem}_scunet.npz (missing={len(reader.missing)})")

    save_params(args.out, params)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
