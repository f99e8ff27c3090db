"""F7 processor contract: a workspace of the reference's own PAGE-XML
pages goes through parse -> distributed extraction -> PAGE-XML out, and
the output pages carry the reference reading order span for span."""

import os
import shutil

from eynollah_spark.fixtures import FIXTURE_FILES, parse_pagexml
from eynollah_spark.processor import SparkLayoutProcessor


def _stage_workspace(tmp_path):
    in_dir = tmp_path / "ws_in"
    in_dir.mkdir()
    for doc_id, path in FIXTURE_FILES.items():
        shutil.copy(path, in_dir / f"{doc_id}.xml")
    return str(in_dir)


def test_process_workspace_reproduces_reference_order(spark, tmp_path):
    in_dir = _stage_workspace(tmp_path)
    out_dir = str(tmp_path / "ws_out")
    proc = SparkLayoutProcessor(spark)
    proc.setup()
    n = proc.process_workspace(in_dir, out_dir)
    assert n == len(FIXTURE_FILES)
    for doc_id in FIXTURE_FILES:
        out_path = os.path.join(out_dir, f"{doc_id}.xml")
        assert os.path.exists(out_path)
        got = parse_pagexml(out_path, doc_id)
        # compare against the raw XML's own reference order (load_fixture
        # would add the euler synthetic table span that is not in the XML)
        want = parse_pagexml(FIXTURE_FILES[doc_id], doc_id)
        assert [(k, t) for k, t, _m, _o in got.expected] == \
               [(k, t) for k, t, _m, _o in want.expected], doc_id


def test_process_workspace_resumes(spark, tmp_path):
    """Reference semantics (eynollah.py:2074-2079): pages whose output
    exists are skipped; a second run writes nothing new."""
    in_dir = _stage_workspace(tmp_path)
    out_dir = str(tmp_path / "ws_out")
    proc = SparkLayoutProcessor(spark)
    first = proc.process_workspace(in_dir, out_dir)
    assert first == len(FIXTURE_FILES)
    again = proc.process_workspace(in_dir, out_dir)
    assert again == 0
