"""System advisor (cli/check_system.py): probe -> recommend -> config file.

Parity with the reference's check_system.py contract (probe hardware, emit
recommended settings, write config_optimized.json, print launch command).
"""

import json

from ldm3d_tpu.cli.check_system import (
    generate_config_file,
    generate_launch_command,
    main,
    probe_devices,
    probe_host,
    recommend_settings,
)


def test_probe_and_recommend():
    dev = probe_devices()
    host = probe_host()
    assert dev["available"] and dev["num_devices"] >= 1
    assert host["cpu_count"] >= 1 and host["ram_gb"] > 0
    rec = recommend_settings(dev, host)
    assert rec["preset"].endswith(".json")
    assert isinstance(rec["batch_size"], int) and len(rec["patch_size"]) == 3
    # multi-chip advice present on the 8-device test mesh
    assert any("--zero" in n for n in rec["notes"])


def test_no_accelerator_falls_back_to_cpu_preset():
    rec = recommend_settings({"available": False}, {"cpu_count": 4})
    assert rec["preset"] == "config_tiny_cpu.json"
    assert rec["amp"] is False


def test_main_writes_config_and_launch_command(tmp_path, capsys):
    out = tmp_path / "config_optimized.json"
    report = main(["--output", str(out), "--json"])
    assert out.exists()
    cfg = json.loads(out.read_text())
    assert cfg["autoencoder_train"]["batch_size"] == report["recommendation"]["batch_size"]
    assert "train_autoencoder" in report["launch_command"]
    # stdout is a single machine-readable JSON document under --json
    printed = json.loads(capsys.readouterr().out)
    assert printed["recommendation"]["preset"] == report["recommendation"]["preset"]


def test_config_file_round_trips_recommendation(tmp_path):
    rec = {"preset": "config_tiny_cpu.json", "batch_size": 3, "patch_size": [48, 48, 48]}
    out = tmp_path / "c.json"
    generate_config_file(rec, str(out))
    cfg = json.loads(out.read_text())
    assert cfg["autoencoder_train"]["batch_size"] == 3
    assert cfg["autoencoder_train"]["patch_size"] == [48, 48, 48]
    rec["output"] = str(out)
    assert str(out) in generate_launch_command(rec)


def test_headroom_model_and_margin_aware_remat():
    """Round-3 verdict item 3: every recommendation carries a modeled peak
    HBM + headroom figure, and no-remat is only advised with >=20% headroom."""
    from ldm3d_tpu.cli.check_system import (
        _MIN_HEADROOM,
        estimate_stage1_peak_bytes,
    )

    # anchor round-trip: batch 8 @64^3 no-remat models inside the on-chip
    # bracket (14, 16) GiB measured on the 16 GiB v5e
    peak = estimate_stage1_peak_bytes(8, [64, 64, 64], False)
    assert 14 * 2**30 < peak < 16 * 2**30

    # monotone in batch, voxels, and remat aggressiveness
    assert estimate_stage1_peak_bytes(16, [64] * 3, False) > peak
    assert estimate_stage1_peak_bytes(8, [96] * 3, False) > peak
    p_convs = estimate_stage1_peak_bytes(8, [64] * 3, "convs")
    p_full = estimate_stage1_peak_bytes(8, [64] * 3, True)
    assert p_full < p_convs < peak

    # 16 GiB tier: no-remat has < 20% headroom -> convs recommended
    dev16 = {"available": True, "device_kind": "TPU v5 lite", "num_devices": 1,
             "per_chip_hbm_bytes": 16 * 2**30}
    rec16 = recommend_settings(dev16, {})
    assert rec16["remat"] == "convs"
    assert rec16["hbm_headroom_frac"] >= _MIN_HEADROOM
    assert rec16["estimated_peak_hbm_gb"] > 0
    assert "--remat convs" in generate_launch_command({**rec16, "output": "c.json"})

    # 32 GiB tier: batch 2 @96^3 no-remat leaves ample headroom -> no remat
    dev32 = {"available": True, "device_kind": "TPU vBig", "num_devices": 1,
             "per_chip_hbm_bytes": 32 * 2**30}
    rec32 = recommend_settings(dev32, {})
    assert rec32["remat"] is False
    assert rec32["hbm_headroom_frac"] >= _MIN_HEADROOM
    # every recommendation names its headroom basis for auditability
    assert "hbm_probe" in rec16["headroom_basis"]
