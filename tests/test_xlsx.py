"""Native .xlsx writer (utils/xlsx.py): structure, round-trip, pipeline wiring.

The reference exports Excel workbooks (temp.py:502-808); this image has no
openpyxl, so the writer emits OOXML directly and these tests validate it by
parsing the zip/XML back (read_xlsx_rows) rather than via a library."""

import os
import zipfile
import xml.etree.ElementTree as ET

import numpy as np
import pandas as pd
import pytest

from facerecognitionpipeline_tpu.utils.xlsx import (
    _col_letter,
    read_xlsx_rows,
    write_xlsx,
)


def test_col_letters():
    assert [_col_letter(i) for i in (0, 1, 25, 26, 27, 51, 52, 701, 702)] == [
        "A", "B", "Z", "AA", "AB", "AZ", "BA", "ZZ", "AAA",
    ]


def test_workbook_structure_and_xml_wellformed(tmp_path):
    path = str(tmp_path / "wb.xlsx")
    write_xlsx(path, {"Results": [["a", "b"], [1, 2.5]]})
    with zipfile.ZipFile(path) as z:
        names = set(z.namelist())
        assert {
            "[Content_Types].xml", "_rels/.rels", "xl/workbook.xml",
            "xl/_rels/workbook.xml.rels", "xl/styles.xml",
            "xl/worksheets/sheet1.xml",
        } <= names
        for n in names:  # every part must be well-formed XML
            ET.fromstring(z.read(n))


def test_round_trip_types(tmp_path):
    path = str(tmp_path / "types.xlsx")
    rows = [
        ["name", "score", "count", "flag", "note"],
        ["alice", 0.9125, 3, True, "ok & <fine>"],
        ["bob", -1.5, 0, False, ""],
    ]
    write_xlsx(path, {"S": rows})
    back = read_xlsx_rows(path)["S"]
    assert back[0] == rows[0]
    assert back[1] == ["alice", 0.9125, 3, True, "ok & <fine>"]
    assert back[2][:4] == ["bob", -1.5, 0, False]


def test_dataframe_and_numpy_scalars(tmp_path):
    path = str(tmp_path / "df.xlsx")
    df = pd.DataFrame(
        {"Model": ["ir_50"], "Rank-1": [np.float64(0.97)],
         "N": [np.int64(60)]}
    )
    write_xlsx(path, {"summary": df})
    back = read_xlsx_rows(path)["summary"]
    assert back[0] == ["Model", "Rank-1", "N"]
    assert back[1] == ["ir_50", 0.97, 60]


def test_multiple_sheets_and_name_sanitization(tmp_path):
    path = str(tmp_path / "multi.xlsx")
    long = "x" * 40
    write_xlsx(path, {"a/b:c": [[1]], long: [[2]], long + "y": [[3]]})
    back = read_xlsx_rows(path)
    names = list(back)
    assert names[0] == "a_b_c"
    assert len(names) == 3
    assert all(len(n) <= 31 for n in names)
    assert len(set(n.lower() for n in names)) == 3  # deduplicated
    assert [back[n][0][0] for n in names] == [1, 2, 3]


def test_nan_inf_do_not_break_excel(tmp_path):
    path = str(tmp_path / "nan.xlsx")
    write_xlsx(path, {"S": [[float("nan"), float("inf")]]})
    back = read_xlsx_rows(path)["S"]
    assert back[0] == ["nan", "inf"]  # stored as text, not invalid numbers


def test_empty_sheets_rejected(tmp_path):
    with pytest.raises(ValueError):
        write_xlsx(str(tmp_path / "e.xlsx"), {})


def test_eval_pipeline_writes_workbook(tmp_path, monkeypatch):
    """export_results emits evaluation_results.xlsx with the summary tables."""
    from facerecognitionpipeline_tpu.evalharness import pipeline as P

    df = pd.DataFrame(
        {"Model": ["m"], "Gallery": ["g"], "Aggregation": ["mean"],
         "Rank-1": [0.9], "ROC-AUC": [0.95], "d-prime": [2.0]}
    )
    empty = pd.DataFrame()
    monkeypatch.setattr(P, "generate_comparison_summary", lambda r: df)
    monkeypatch.setattr(P, "generate_verification_summary", lambda r: empty)
    monkeypatch.setattr(P, "analyze_gallery_strategies", lambda r: empty)
    monkeypatch.setattr(P, "compare_models_statistical", lambda r: empty)
    monkeypatch.setattr(P, "analyze_failure_cases", lambda r: {})
    out = str(tmp_path / "out")
    P.export_results({}, out)
    wb = read_xlsx_rows(os.path.join(out, "evaluation_results.xlsx"))
    assert list(wb) == ["identification_summary"]
    assert wb["identification_summary"][0][0] == "Model"
    assert wb["identification_summary"][1][3] == 0.9
