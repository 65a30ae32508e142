"""End-to-end CLI parity (__main__.py): the reference's four entry
points (http-client -> generar-datos -> calcular-kpi -> generar-reporte,
reference src/http_client.py:199-211, src/generar_datos.py:72-79,
src/calcular_kpi.py:156-160, src/generar_reporte.py:252-257) chained
through the filesystem exactly as a shell user would run them, producing
the per-task HTTP output files, the 9-column KPI CSV and the HTML
report."""

from __future__ import annotations

import csv
import glob
from pathlib import Path

from prueba_tecnica_http_client_etl_spark.__main__ import main
from prueba_tecnica_http_client_etl_spark.schemas import KPI_COLUMNS


def test_cli_five_stage_workflow(spark, tmp_path, capsys):
    datos = str(tmp_path / "datos.jsonl")
    kpi_csv = str(tmp_path / "kpi_por_endpoint_dia.csv")
    html = str(tmp_path / "report" / "kpi_diario.html")
    http_out = str(tmp_path / "out")

    # stage E (reference src/http_client.py): 8-task HTTP sequence over
    # the in-memory transport (default; --real switches to requests)
    assert main(["http-client", "--out_dir", http_out]) == 0
    out = capsys.readouterr().out
    assert "OK -> Cliente HTTP completado: 3 archivos" in out
    assert "[AUTH BASIC] OK" in out and "[COOKIES] OK" in out
    for fname in ("datos.json", "datos.xml", "titulo.html"):
        assert (Path(http_out) / fname).exists()
    assert (Path(http_out) / "titulo.html").read_text(encoding="utf-8") != ""

    assert main(["generar-datos", "--n_registros", "500", "--salida", datos, "--seed", "123"]) == 0
    out = capsys.readouterr().out
    assert "OK -> Generados 500 registros" in out
    jsonl_parts = glob.glob(f"{datos}/part-*")
    assert len(jsonl_parts) == 1  # --single_file default: reference-shaped single part
    assert sum(1 for _ in open(jsonl_parts[0])) == 500

    assert main(["calcular-kpi", "--input", datos, "--output", kpi_csv]) == 0
    assert "KPIs generados" in capsys.readouterr().out
    [csv_part] = glob.glob(f"{kpi_csv}/part-*")
    with open(csv_part, newline="") as f:
        rows = list(csv.reader(f))
    assert rows[0] == KPI_COLUMNS  # exact 9-column reference header, exact order
    assert len(rows) > 1

    assert main(["generar-reporte", "--input", kpi_csv, "--output", html, "--umbral_p90", "300"]) == 0
    assert "Reporte generado" in capsys.readouterr().out
    page = Path(html).read_text(encoding="utf-8")
    assert "<table>" in page and "endpoint_base" in page
    # reference content parity: the threshold note is in the report; the
    # chart <img> tags appear exactly when PNGs were rendered (matplotlib
    # is optional in this container)
    assert "Umbral alerta p90: <b>300.00 ms</b>" in page
    charts_rendered = (Path(html).parent / "requests_por_endpoint.png").exists()
    assert ('<img src="requests_por_endpoint.png"' in page) == charts_rendered

    # determinism: the seeded generator is reproducible run-to-run
    datos2 = str(tmp_path / "datos2.jsonl")
    assert main(["generar-datos", "--n_registros", "500", "--salida", datos2, "--seed", "123"]) == 0
    capsys.readouterr()
    [p2] = glob.glob(f"{datos2}/part-*")
    assert sorted(open(jsonl_parts[0]).readlines()) == sorted(open(p2).readlines())
