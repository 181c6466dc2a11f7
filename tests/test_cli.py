"""CLI smoke tests (subprocess, CPU backend) — run.sh/dlrm-CLI parity
surface: random train, inference-only, save/load roundtrip."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(*args, timeout=300):
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["PEL_FORCE_CPU"] = "1"
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import sys; sys.argv=['cli']+%r;"
        "from pim_embedding_lookup_tpu.cli import main; main()" % (list(args),)
    )
    return subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=timeout, cwd=REPO, env=env,
    )


def test_train_random_small():
    r = run_cli(
        "train", "--data-generation=random",
        "--arch-embedding-size=200-300", "--arch-sparse-feature-size=8",
        "--arch-mlp-bot=4-8-8", "--arch-mlp-top=8-1",
        "--mini-batch-size=16", "--num-batches=6", "--num-indices-per-lookup=2",
        "--test-freq=3", "--mesh-model=4",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "step 3:" in r.stdout and "auc=" in r.stdout


def test_inference_only():
    r = run_cli(
        "train", "--inference-only", "--data-generation=random",
        "--arch-embedding-size=100-100", "--arch-sparse-feature-size=8",
        "--arch-mlp-bot=4-8", "--arch-mlp-top=4-1",
        "--mini-batch-size=8", "--num-batches=3", "--print-time",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "accuracy=" in r.stdout
    assert "inference:" in r.stdout  # --print-time phase report


def test_train_routed_hot_cache():
    """Routed sparse training with the hot-row replica + periodic rebuild
    (--hot-k / --hot-rebuild-every, VERDICT r1 item 10)."""
    r = run_cli(
        "train", "--data-generation=random",
        "--arch-embedding-size=200-9000-20000", "--arch-sparse-feature-size=8",
        "--arch-mlp-bot=4-8-8", "--arch-mlp-top=8-1", "--sharding=row_hash",
        "--mini-batch-size=16", "--num-batches=6", "--num-indices-per-lookup=2",
        "--hybrid", "--routed", "--hot-k=16", "--hot-rebuild-every=2",
        "--test-freq=3", "--mesh-model=4",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "step 3:" in r.stdout and "auc=" in r.stdout


def test_save_load_roundtrip(tmp_path):
    ckpt = str(tmp_path / "model_ckpt")
    common = [
        "--data-generation=random", "--arch-embedding-size=100-100",
        "--arch-sparse-feature-size=8", "--arch-mlp-bot=4-8", "--arch-mlp-top=4-1",
        "--mini-batch-size=8", "--num-batches=3",
    ]
    r1 = run_cli("train", *common, f"--save-model={ckpt}")
    assert r1.returncode == 0, r1.stderr[-2000:]
    # sparse path (default) saves the FULL train state (emb+acc+opt+step)
    assert "saved full train state" in r1.stdout
    r2 = run_cli("train", "--inference-only", *common, f"--load-model={ckpt}")
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "loaded model" in r2.stdout
    # full-state resume path announces the step it resumed at
    r3 = run_cli("train", *common, f"--load-model={ckpt}")
    assert r3.returncode == 0, r3.stderr[-2000:]
    assert "resumed full train state" in r3.stdout and "at step 3" in r3.stdout
