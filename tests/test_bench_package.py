"""Keep the bench/ probe package runnable: every module must import (no
stale cross-module imports after the root-script consolidation) and every
repo-relative config path literal must resolve. Guards the probes behind
docs/PERF.md from silently rotting."""

import ast
import importlib
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench")
MODULES = sorted(
    f[:-3] for f in os.listdir(BENCH) if f.endswith(".py") and f != "__init__.py"
)


@pytest.mark.parametrize("name", MODULES)
def test_bench_module_imports(name):
    importlib.import_module(f"bench.{name}")


def test_config_path_literals_resolve():
    pat = re.compile(r"[\"'](animal2vec_tpu/configs/[^\"']+)[\"']")
    missing = []
    for fname in os.listdir(BENCH):
        if not fname.endswith(".py"):
            continue
        src = open(os.path.join(BENCH, fname)).read()
        ast.parse(src)  # syntax
        for rel in pat.findall(src):
            if not os.path.exists(os.path.join(REPO, rel)):
                missing.append((fname, rel))
    assert not missing, missing
