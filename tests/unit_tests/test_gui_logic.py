"""GUI module smoke tests under a mocked PySide6 (the real toolkit is an
optional extra and not installed in CI). Validates that gui.py imports and
that its non-Qt logic (progress formatting, parameter dataclasses) works."""

from __future__ import annotations

import sys
import types

import pytest


class _Signal:
    def __init__(self, *types_):
        self._subs = []

    def __set_name__(self, owner, name):
        self._name = name

    def connect(self, fn, *a):
        self._subs.append(fn)

    def emit(self, *a):
        for fn in list(self._subs):
            fn(*a)


class _QObject:
    def __init__(self, *a, **k):
        pass

    def moveToThread(self, t):
        pass


def _fake_pyside() -> dict:
    qtcore = types.ModuleType("PySide6.QtCore")
    qtcore.QObject = _QObject
    qtcore.Signal = lambda *a, **k: _Signal(*a)
    qtcore.Slot = lambda *a, **k: (lambda fn: fn)
    qtcore.QThread = type("QThread", (), {"__init__": lambda self, *a: None,
                                          "start": lambda self: None,
                                          "quit": lambda self: None,
                                          "wait": lambda self, *a: None})
    qtcore.QSemaphore = type(
        "QSemaphore",
        (),
        {
            "__init__": lambda self, n=0: setattr(self, "_n", n),
            "release": lambda self, n=1: setattr(self, "_n", self._n + n),
            "tryAcquire": lambda self: (
                (setattr(self, "_n", self._n - 1) or True) if self._n > 0 else False
            ),
        },
    )
    qtcore.Qt = types.SimpleNamespace(DirectConnection=0)

    qtwidgets = types.ModuleType("PySide6.QtWidgets")
    for name in (
        "QApplication QCheckBox QComboBox QDoubleSpinBox QFormLayout QGroupBox QHBoxLayout"
        " QLabel QLineEdit QMainWindow QMessageBox QPlainTextEdit QPushButton"
        " QSpinBox QVBoxLayout QWidget"
    ).split():
        setattr(
            qtwidgets,
            name,
            type(name, (), {"__init__": lambda self, *a, **k: None,
                            "__getattr__": lambda self, _n: (lambda *a, **k: None)}),
        )

    pyside = types.ModuleType("PySide6")
    pyside.QtCore = qtcore
    pyside.QtWidgets = qtwidgets
    return {"PySide6": pyside, "PySide6.QtCore": qtcore, "PySide6.QtWidgets": qtwidgets}


@pytest.fixture()
def gui_module(monkeypatch):
    for name, mod in _fake_pyside().items():
        monkeypatch.setitem(sys.modules, name, mod)
    sys.modules.pop("hydrus_video_deduplicator_tpu.gui.gui", None)
    import importlib

    module = importlib.import_module("hydrus_video_deduplicator_tpu.gui.gui")
    yield module
    sys.modules.pop("hydrus_video_deduplicator_tpu.gui.gui", None)


def test_gui_imports_under_mock(gui_module):
    assert hasattr(gui_module, "Worker")
    assert hasattr(gui_module, "MainWindow")
    assert hasattr(gui_module, "gui_main")


def test_progress_formatting(gui_module):
    from hydrus_video_deduplicator_tpu.dedup import (
        BuildingSearchTreeProgress,
        DoneProgress,
        HashingProgress,
        NoneProgress,
        SearchingForDuplicatesProgress,
    )

    worker = gui_module.Worker()
    fmt = worker._format_progress
    assert fmt(HashingProgress(3, 10)) == "Hashing files: 3/10"
    assert fmt(BuildingSearchTreeProgress(1, 2)) == "Building search tree: 1/2"
    assert fmt(SearchingForDuplicatesProgress(9, 9)) == "Searching for duplicates: 9/9"
    assert fmt(DoneProgress()) == "Done."
    assert fmt(NoneProgress()) == ""


def test_skip_semaphore_logic(gui_module):
    worker = gui_module.Worker()
    assert worker._should_skip() is False
    worker.skip_step()
    assert worker._should_skip() is True
    assert worker._should_skip() is False  # consumed


def test_parameter_dataclasses(gui_module):
    params = gui_module.DedupeParameters(threshold=80.0, skip_hashing=True)
    assert params.threshold == 80.0
    assert params.custom_query == []
    conn = gui_module.HydrusRequestParameters(api_url="http://x", api_key="k")
    assert conn.file_service_keys == []


def test_worker_full_flow_against_fake_hydrus(gui_module, tmp_path):
    """End-to-end GUI worker logic (connect -> open db -> dedupe ->
    maintenance ops) with the fake Hydrus server, no real Qt needed."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parents[1].parent / "tests"))
    from tests.fake_hydrus import (
        CORPUS_EXPECTED_PAIRS,
        DEFAULT_ACCESS_KEY,
        FakeHydrus,
        corpus_file_store,
    )

    server = FakeHydrus(corpus_file_store())
    server.start()
    try:
        worker = gui_module.Worker()
        events = {"connect": [], "db": [], "dedupe": [], "maint": [], "progress": []}
        worker.connect_complete.connect(lambda ok, msg: events["connect"].append((ok, msg)))
        worker.init_db_complete.connect(lambda ok, msg: events["db"].append((ok, msg)))
        worker.dedupe_complete.connect(
            lambda ok, msg, pairs: events["dedupe"].append((ok, msg, pairs))
        )
        worker.maintenance_complete.connect(lambda ok, msg: events["maint"].append((ok, msg)))
        worker.dedupe_progress.connect(events["progress"].append)

        # bad key first -> failure surfaced via signal, not an exception
        worker.connect_to_hydrus(
            gui_module.HydrusRequestParameters(api_url=server.url, api_key="0" * 64)
        )
        assert events["connect"][-1][0] is False

        worker.connect_to_hydrus(
            gui_module.HydrusRequestParameters(
                api_url=server.url, api_key=DEFAULT_ACCESS_KEY
            )
        )
        assert events["connect"][-1][0] is True

        worker.init_db_connection(tmp_path / "guidb")
        assert events["db"][-1][0] is True

        worker.run_dedupe(gui_module.DedupeParameters(threshold=50.0))
        ok, msg, pairs = events["dedupe"][-1]
        assert ok and pairs == CORPUS_EXPECTED_PAIRS  # all corpus groups
        assert any("Hashing files" in p for p in events["progress"])
        assert any("Done" in p for p in events["progress"])

        for op in ("vacuum", "clear_search_cache", "reset_potentials", "clear_search_tree"):
            worker.run_maintenance_op(op)
            assert events["maint"][-1][0] is True, op
        worker.run_maintenance_op("bogus")
        assert events["maint"][-1][0] is False
    finally:
        server.stop()


def test_dedupe_params_reach_orchestrator(gui_module, monkeypatch):
    """The new backend/sampling options flow from DedupeParameters through
    Worker.run_dedupe into the orchestrator constructor."""
    captured = {}

    class FakeDeduper:
        def __init__(self, db, **kwargs):
            captured.update(kwargs)
            captured["db"] = db

        def deduplicate(self, skip_hashing=False):
            captured["skip_hashing"] = skip_hashing
            return 7

        threshold = 75.0

    monkeypatch.setattr(gui_module, "HydrusVideoDeduplicator", FakeDeduper)
    worker = gui_module.Worker()
    worker.client = object()
    worker.db = object()
    done = []
    worker.dedupe_complete.connect(lambda ok, msg, pairs: done.append((ok, pairs)))
    params = gui_module.DedupeParameters(
        threshold=80.0,
        skip_hashing=True,
        search_backend="tpu",
        hash_backend="tpu",
        sampling="scene",
        decode_backend="legacy",
        rerank="none",
    )
    worker.run_dedupe(params)
    assert done == [(True, 7)]
    assert captured["search_backend"] == "tpu"
    assert captured["hash_backend"] == "tpu"
    assert captured["sampling"] == "scene"
    assert captured["rerank"] == "none" and captured["rerank_threshold"] == 0.85
    import os

    assert os.environ.get("HVD_DECODE_BACKEND") == "legacy"
    os.environ.pop("HVD_DECODE_BACKEND", None)
    assert captured["skip_hashing"] is True
    assert FakeDeduper.threshold == 80.0
