"""End-to-end CLI app smoke tests on the CPU mesh: the full experiment
orchestration (L6/L7) with tiny sizes and synthetic data."""

import os

import numpy as np


def test_mnist_app_end_to_end(tmp_path):
    from rcgan_tpu.apps.mnist_app import main

    ts, rec = main([
        "--algorithm", "rcgan", "--alpha", "0.3", "--disc_type", "projection",
        "--noestimate_confuse", "--noaux_classifier", "--noadd_noise", "--noconcat_y",
        "--spectral_norm", "--max_norm", "--train",
        "--epoch", "1", "--train_size", "200", "--batch_size", "50", "--z_dim", "16",
        "--recover_epoch", "5", "--recover_batch_size", "20",
        "--eval_train_size", "512", "--compute_dtype", "float32",
        "--checkpoint_dir", str(tmp_path), "--data_dir", "/nonexistent",
    ])
    assert 0.0 <= rec["accuracy"] <= 1.0
    run_dirs = [d for d in os.listdir(tmp_path) if d.startswith("rcgan_0.3")]
    assert len(run_dirs) == 1
    run = tmp_path / run_dirs[0]
    assert (run / "recovery.txt").exists()
    assert (run / "recover_wrong_images.png").exists()
    assert (run / "command.txt").exists()
    assert (run / "config.json").exists()
    assert int(ts.step) == 4  # 200 // 50 batches


def test_cifar_app_end_to_end(tmp_path):
    from rcgan_tpu.apps.cifar_app import main

    log_file = str(tmp_path / "log.txt")
    ts, acc = main([
        "--algorithm", "rcgan-u", "--alpha", "0.6", "--run", "t",
        "--log_file", log_file, "--parent_dir", str(tmp_path),
        "--niters", "2", "--batch_size", "8", "--dim_g", "8", "--dim_d", "8",
        "--embedding_dim", "12", "--n_critic", "2",
        "--inception_freq", "1000000", "--sample_freq", "2",
        "--generated_label_accuracy_freq", "2",
        "--perm_classifier", "--confuse_init", "--perm_gen_label_acc",
        "--mesh_devices", "1", "--nomulti_gpu_multi_batch",
        "--eval_train_size", "256", "--synthetic_train_size", "512",
        "--compute_dtype", "float32",
    ])
    assert 0.0 <= acc <= 1.0
    assert int(ts.step) == 2
    assert os.path.exists(log_file) and os.path.getsize(log_file) > 0
    log_text = open(log_file).read()
    # the rcgan-u cadence must log the learned-C recovery metric (the
    # round-4 branch a prior freq=1000000 setting left unexecuted)
    assert "learned-C recovery" in log_text
    # --perm_gen_label_acc adds the permutation-corrected accuracy column at
    # the cadence AND reports both raw + corrected numbers at the end
    # (gan_resnet.py:429-439,1022-1029)
    assert "gen-label-acc raw" in log_text
    assert "final raw (uncorrected) generated label accuracy" in log_text
    run_dirs = [d for d in os.listdir(tmp_path) if d.startswith("rcgan-u_alpha0.6")]
    assert len(run_dirs) == 1
    run = tmp_path / run_dirs[0]
    assert (run / "samples_1.png").exists()  # sample_freq=2 → iteration 1
    assert (run / "checkpoint").exists()
    # learned confusion logits live in the checkpointed state
    assert "confusion_logits" in ts.groups["confusion"]


def test_mnist_app_rejects_unsupported_dataset(tmp_path):
    import pytest

    from rcgan_tpu.apps.mnist_app import main

    with pytest.raises(SystemExit):
        main(["--dataset", "cifar", "--checkpoint_dir", str(tmp_path)])


def test_cifar_app_scan_blocks_multi_cycle(tmp_path):
    """The fused scan path must step through multi-cycle blocks and still
    land exactly on checkpoint-cadence iterations (blocks of 20 capped at
    the 25-iter early-checkpoint stops)."""
    import numpy as np

    from rcgan_tpu.apps.cifar_app import main

    ts, acc = main([
        "--algorithm", "rcgan", "--alpha", "0.6", "--run", "sb",
        "--log_file", str(tmp_path / "log.txt"), "--parent_dir", str(tmp_path),
        "--niters", "60", "--batch_size", "8", "--dim_g", "8", "--dim_d", "8",
        "--embedding_dim", "12", "--n_critic", "2",
        "--inception_freq", "1000000", "--sample_freq", "1000000",
        "--generated_label_accuracy_freq", "1000000",
        "--mesh_devices", "1", "--nomulti_gpu_multi_batch",
        "--eval_train_size", "128", "--synthetic_train_size", "256",
        "--compute_dtype", "float32", "--scan_block", "20",
        "--ckpt_early_every", "25",
    ])
    assert int(ts.step) == 60
    assert 0.0 <= acc <= 1.0
    run_dirs = [d for d in (tmp_path).iterdir() if d.name.startswith("rcgan_alpha")]
    assert len(run_dirs) == 1
    # early-cadence checkpoints landed on the exact 25-iter boundaries
    ck = run_dirs[0] / "checkpoint"
    steps = sorted(int(p.name) for p in ck.iterdir() if p.name.isdigit())
    assert {0, 25, 50} <= set(steps)
