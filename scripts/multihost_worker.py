#!/usr/bin/env python
"""
One process of an N-process jax.distributed validation run (the offline stand-
in for one host of a TPU pod slice). Launch N of these with the same
coordinator and distinct --procid; each gets `--local-devices` virtual CPU
devices and they form ONE global mesh.

    python scripts/multihost_worker.py --coordinator localhost:12345 \
        --nprocs 2 --procid 0 --out /tmp/loss0.json

Used by tests/test_multihost.py (which asserts the 2-process loss equals the
single-process 8-device loss) and by the optional multihost leg of
__graft_entry__.dryrun_multichip.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--coordinator", required=True)
    parser.add_argument("--nprocs", type=int, required=True)
    parser.add_argument("--procid", type=int, required=True)
    parser.add_argument("--local-devices", type=int, default=4)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--out", default="", help="write {'loss': ...} JSON here")
    args = parser.parse_args()

    # Force the virtual CPU platform BEFORE any jax backend touch (same dance
    # as tests/conftest.py: the ambient axon sitecustomize presets the
    # platform at interpreter start)
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.local_devices}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    from foldingdiff_tpu.parallel import multihost

    multihost.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.nprocs,
        process_id=args.procid,
    )
    assert jax.process_count() == args.nprocs
    assert jax.device_count() == args.nprocs * args.local_devices

    loss = multihost.dp_train_step_demo(seed=args.seed)
    print(f"[proc {args.procid}] global DP train step loss={loss:.6f}", flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"loss": loss, "process_id": args.procid,
                       "num_processes": args.nprocs,
                       "global_devices": jax.device_count()}, f)


if __name__ == "__main__":
    main()
