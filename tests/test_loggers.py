"""Logger backends (reference main_instance_segmentation.py:51-56 wires
pluggable Lightning loggers chosen by the `logging` Hydra group)."""

import json
import os
import struct

import numpy as np

from unscene3d_tpu.utils.loggers import (
    NeptuneLogger,
    TensorBoardLogger,
    WandbLogger,
    crc32c,
    decode_scalar_event,
    read_tfrecords,
)


def test_crc32c_known_vectors():
    # RFC 3720 / kernel test vectors for CRC32C (Castagnoli)
    assert crc32c(b"") == 0x00000000
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(bytes(32)) == 0x8A9136AA


def test_tfevents_roundtrip(tmp_path):
    lg = TensorBoardLogger(str(tmp_path))
    lg.log({"step": 3, "loss": 1.5, "ap50": 0.25, "mode": "train"})
    lg.log({"step": 7, "loss": np.float32(0.75)})
    files = os.listdir(lg.dir)
    assert len(files) == 1 and files[0].startswith("events.out.tfevents.")
    payloads = read_tfrecords(lg.path)  # verifies both masked CRCs
    assert len(payloads) == 3
    head = decode_scalar_event(payloads[0])
    assert head["scalars"] == {}  # file_version record
    ev1 = decode_scalar_event(payloads[1])
    assert ev1["step"] == 3
    assert ev1["scalars"]["loss"] == 1.5
    assert abs(ev1["scalars"]["ap50"] - 0.25) < 1e-7
    assert "mode" not in ev1["scalars"]  # non-numeric fields are dropped
    ev2 = decode_scalar_event(payloads[2])
    assert ev2["step"] == 7 and ev2["scalars"]["loss"] == 0.75


def test_tfevents_file_version_header(tmp_path):
    lg = TensorBoardLogger(str(tmp_path))
    payload = read_tfrecords(lg.path)[0]
    # field 3 (file_version), wire type 2, value "brain.Event:2"
    assert b"brain.Event:2" in payload
    assert payload[:1] == struct.pack("B", (1 << 3) | 1)  # wall_time double


def test_service_loggers_fall_back_to_jsonl(tmp_path):
    # neither wandb nor neptune is installed in this image: both must
    # degrade to the offline JSONL stream without error
    for cls, name in ((WandbLogger, "wandb"), (NeptuneLogger, "neptune")):
        lg = cls(str(tmp_path))
        lg.log({"loss": 2.0, "epoch": 1})
        with open(os.path.join(tmp_path, f"{name}_offline.jsonl")) as f:
            rows = [json.loads(line) for line in f]
        assert rows[-1]["loss"] == 2.0


def test_logging_config_group_builds_real_backends(tmp_path):
    from main_instance_segmentation import get_parameters
    from unscene3d_tpu.train.experiment import build_loggers

    cfg = get_parameters([
        "logging=offline",
        f"general.save_dir={tmp_path}",
        "general.experiment_name=lgtest",
    ])
    ml = build_loggers(cfg)
    kinds = {type(lg).__name__ for lg in ml.loggers}
    assert "TensorBoardLogger" in kinds
    ml.log({"step": 1, "loss": 3.0})
    tb = [lg for lg in ml.loggers if type(lg).__name__ == "TensorBoardLogger"]
    assert len(read_tfrecords(tb[0].path)) == 2
