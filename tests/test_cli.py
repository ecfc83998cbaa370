"""Unified CLI dispatcher (`python -m srgan_st_tpu`) and config overrides.

The reference exposes its workflows as separate scripts; the dispatcher
(srgan_st_tpu/__main__.py) routes them through one front door, and
`--set GROUP.FIELD=value` (core/config.py apply_overrides) makes every
code-as-config field reachable from the command line.
"""

import pytest

from srgan_st_tpu.__main__ import _COMMANDS, main
from srgan_st_tpu.core.config import Config, apply_overrides


class TestDispatcher:
    def test_help_lists_every_command(self, capsys):
        main([])
        out = capsys.readouterr().out
        for name in _COMMANDS:
            assert name in out
        main(["--help"])
        assert "commands:" in capsys.readouterr().out

    def test_unknown_command_exits_2(self, capsys):
        with pytest.raises(SystemExit) as e:
            main(["frobnicate"])
        assert e.value.code == 2
        assert "unknown command" in capsys.readouterr().err

    def test_dispatch_forwards_argv(self, monkeypatch):
        # importlib, not `import a.b as m`: the eval package re-exports the
        # `validate` FUNCTION, which shadows the submodule attribute
        import importlib

        seen = {}
        validate_mod = importlib.import_module("srgan_st_tpu.eval.validate")
        monkeypatch.setattr(
            validate_mod, "main", lambda argv: seen.setdefault("argv", argv)
        )
        main(["validate", "--exp_name", "x"])
        assert seen["argv"] == ["--exp_name", "x"]

    def test_subcommand_help_exits_0(self):
        # full path through a real argparse target (imports the module)
        with pytest.raises(SystemExit) as e:
            main(["infer", "--help"])
        assert e.value.code == 0

    def test_train_cli_applies_overrides(self, monkeypatch):
        import importlib

        train_mod = importlib.import_module("srgan_st_tpu.train.train")
        captured = {}
        monkeypatch.setattr(
            train_mod, "train", lambda config: captured.setdefault("c", config)
        )
        train_mod.cli([
            "--exp_name", "cli-test", "--epochs", "3",
            "--set", "TPU.REMAT=true", "--set", "DATA.GT_IMAGE_SIZE=48",
        ])
        c = captured["c"]
        assert c.EXP.NAME == "cli-test"
        assert c.EXP.N_EPOCHS == 3
        assert c.TPU.REMAT is True
        assert c.DATA.GT_IMAGE_SIZE == 48

    def test_run_cli_applies_overrides_after_experiment_mutator(self, monkeypatch):
        import srgan_st_tpu.main as run_mod

        captured = {}
        monkeypatch.setattr(
            run_mod, "train", lambda config: captured.setdefault("c", config)
        )
        monkeypatch.setattr(
            run_mod, "test", lambda config, save_images: None
        )
        run_mod.main(["--job_index", "1", "--set", "EXP.N_EPOCHS=2"])
        c = captured["c"]
        assert c.EXP.NAME == "patchwise-st-disc"  # job 1 mutator ran
        assert c.EXP.N_EPOCHS == 2                # then the override

    def test_warmup_cli_applies_overrides(self, monkeypatch):
        import importlib

        warmup_mod = importlib.import_module("srgan_st_tpu.train.warmup")
        captured = {}
        monkeypatch.setattr(
            warmup_mod, "warmup", lambda config: captured.setdefault("c", config)
        )
        warmup_mod.cli(["--batch_size", "8", "--train_dir", "/tmp/p"])
        assert captured["c"].DATA.BATCH_SIZE == 8
        assert captured["c"].DATA.TRAIN_GT_IMAGES_DIR == "/tmp/p"


class TestApplyOverrides:
    def test_typed_coercion_follows_field_type(self):
        c = apply_overrides(Config(), [
            "DATA.BATCH_SIZE=32",            # int
            "SOLVER.G_BASE_LR=0.001",        # float
            "TPU.COMPUTE_DTYPE=bfloat16",    # str
            "TPU.REMAT=true",                # bool
            "DATA.TILE_SIZE=112",            # None -> literal int
        ])
        assert c.DATA.BATCH_SIZE == 32 and isinstance(c.DATA.BATCH_SIZE, int)
        assert c.SOLVER.G_BASE_LR == pytest.approx(1e-3)
        assert c.TPU.COMPUTE_DTYPE == "bfloat16"
        assert c.TPU.REMAT is True
        assert c.DATA.TILE_SIZE == 112

    def test_none_literal(self):
        c = apply_overrides(Config(), ["DATA.TILE_SIZE=none"])
        assert c.DATA.TILE_SIZE is None

    def test_top_level_field(self):
        c = apply_overrides(Config(), ["LOG_TRAIN_PERIOD=5"])
        assert c.LOG_TRAIN_PERIOD == 5

    def test_list_literal(self):
        c = apply_overrides(Config(), ["SCHEDULER.MILESTONES=[1, 2]"])
        assert c.SCHEDULER.MILESTONES == [1, 2]

    def test_dict_entry_is_reachable(self):
        # existing keys only: typo protection applies to dict entries too
        # (adding criterions is add_g_criterion's job, not --set's)
        c = apply_overrides(Config(), [
            "MODEL.G_LOSS.CRITERION_WEIGHTS.Pixel=2.0",          # float entry
            "MODEL.G_LOSS.CRITERIONS.Adversarial={'kind': 'adversarial', 'smoothing': 0.2}",
        ])
        assert c.MODEL.G_LOSS.CRITERION_WEIGHTS["Pixel"] == pytest.approx(2.0)
        assert c.MODEL.G_LOSS.CRITERIONS["Adversarial"] == {
            "kind": "adversarial", "smoothing": 0.2}

    def test_missing_dict_entry_lists_real_entries(self):
        with pytest.raises(SystemExit) as e:
            apply_overrides(Config(), ["MODEL.G_LOSS.CRITERIONS.Pixl=x"])
        msg = str(e.value)
        assert "Adversarial" in msg and "Pixl" not in msg.split("(entries:")[1]

    def test_traversal_through_scalar_is_a_friendly_error(self):
        with pytest.raises(SystemExit) as e:
            apply_overrides(Config(), ["DATA.BATCH_SIZE.X=1"])
        assert "plain int value" in str(e.value)

    def test_unknown_field_is_an_error_with_siblings(self):
        with pytest.raises(SystemExit) as e:
            apply_overrides(Config(), ["DATA.BATCHSIZE=32"])
        assert "BATCH_SIZE" in str(e.value)  # siblings listed for the typo

    def test_bad_bool_is_an_error(self):
        with pytest.raises(SystemExit):
            apply_overrides(Config(), ["TPU.REMAT=maybe"])

    def test_missing_equals_is_an_error(self):
        with pytest.raises(SystemExit):
            apply_overrides(Config(), ["DATA.BATCH_SIZE"])
