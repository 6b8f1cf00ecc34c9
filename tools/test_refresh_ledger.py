#!/usr/bin/env python3
"""Guard test for refresh_ledger.py: a run whose host_drift exceeds
MAX_LEDGER_DRIFT must be refused (the round-7 loaded-host incident class),
a quiet run must load. Run: python3 tools/test_refresh_ledger.py"""
import importlib.util
import json
import os
import tempfile

spec = importlib.util.spec_from_file_location(
    "refresh_ledger", os.path.join(os.path.dirname(__file__),
                                   "refresh_ledger.py"))
rl = importlib.util.module_from_spec(spec)
spec.loader.exec_module(rl)


def run(drift):
    d = {"metric": "total", "value": 1.0, "sf": "/root/testdata/sf0.1",
         "host_drift": drift, "queries": {"q_x": 1.0}}
    with tempfile.NamedTemporaryFile("w", suffix=".json",
                                     delete=False) as f:
        json.dump(d, f)
    try:
        rl.load(f.name)
        return True
    except SystemExit:
        return False
    finally:
        os.unlink(f.name)


assert run(1.05) is True, "quiet run must load"
assert run(rl.MAX_LEDGER_DRIFT + 0.01) is False, "drifted run must refuse"
print("refresh_ledger drift guard OK")
