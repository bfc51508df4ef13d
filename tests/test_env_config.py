"""Env-var configuration tier tests (reference constants.py:7-23,244-258)."""

import os

import pytest

from ipp_rl_tpu.config.env import (
    env_settings,
    load_dotenv,
    load_from_env,
    log_env_variables,
)


def test_load_from_env_types(monkeypatch):
    monkeypatch.setenv("X_INT", "7")
    monkeypatch.setenv("X_BOOL_T", "True")
    monkeypatch.setenv("X_BOOL_F", "no")
    monkeypatch.setenv("X_EMPTY", "")
    assert load_from_env("X_INT", int) == 7
    assert load_from_env("X_BOOL_T", bool) is True
    assert load_from_env("X_BOOL_F", bool) is False
    # empty value falls through to the default (reference :8)
    assert load_from_env("X_EMPTY", str, "dflt") == "dflt"
    # missing without default raises (reference :18-22)
    with pytest.raises(ValueError):
        load_from_env("X_DEFINITELY_MISSING", str)


def test_load_dotenv(tmp_path, monkeypatch):
    p = tmp_path / ".env"
    p.write_text(
        "# comment\n"
        "CHECKPOINTS_DIR=ck\n"
        'QUOTED="hello world"\n'
        "export EXPORTED=1\n"
        "ALREADY_SET=from_file\n"
        "\n"
        "not a kv line\n"
    )
    monkeypatch.setenv("ALREADY_SET", "from_env")
    monkeypatch.delenv("CHECKPOINTS_DIR", raising=False)
    monkeypatch.delenv("QUOTED", raising=False)
    monkeypatch.delenv("EXPORTED", raising=False)
    parsed = load_dotenv(str(p))
    assert parsed["CHECKPOINTS_DIR"] == "ck"
    assert os.environ["QUOTED"] == "hello world"
    assert os.environ["EXPORTED"] == "1"
    # process env wins without override (compose env_file semantics)
    assert os.environ["ALREADY_SET"] == "from_env"
    load_dotenv(str(p), override=True)
    assert os.environ["ALREADY_SET"] == "from_file"
    # absent file is a no-op
    assert load_dotenv(str(tmp_path / "missing.env")) == {}


def test_env_settings_and_log(monkeypatch, tmp_path):
    monkeypatch.setenv("CHECKPOINTS_DIR", "my_ckpts")
    monkeypatch.setenv("LOG_DIR", "/abs/logs")
    monkeypatch.delenv("TRAIN_DATA_DIR", raising=False)
    s = env_settings(repo_dir=str(tmp_path))
    assert s["CHECKPOINTS_DIR"] == str(tmp_path / "my_ckpts")  # rooted
    assert s["LOG_DIR"] == "/abs/logs"  # absolute kept
    assert s["TRAIN_DATA_DIR"] == str(tmp_path / "train_data")  # default
    assert log_env_variables(str(tmp_path)) == s
