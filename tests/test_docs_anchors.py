"""Doc-anchor freshness gate (VERDICT r7 next-round #6).

Every ``file.py`` / ``file.py:N`` / ``file.py::symbol`` mention in the
maintained docs must still resolve against the working tree — stale
anchors cost the next zero-memory session real time chasing moved code.
No Spark needed; this is pure filesystem.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "scripts"))


def test_doc_anchors_resolve():
    from check_anchors import check_all

    problems = check_all()
    assert not problems, "\n".join(problems)
