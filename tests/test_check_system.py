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
