"""CLI parity wrappers: the reference operates its pipeline through four
entry points (src/http_client.py:199-211, src/generar_datos.py:72-79,
src/calcular_kpi.py:156-160, src/generar_reporte.py:252-257); this module
maps the same flags onto the Spark-native operators so the full workflow
runs end to end from a shell:

    python -m prueba_tecnica_http_client_etl_spark http-client \
        --out_dir out            # add --real to hit a live httpbin
    python -m prueba_tecnica_http_client_etl_spark generar-datos \
        --n_registros 50000 --salida out/datos.jsonl --seed 123
    python -m prueba_tecnica_http_client_etl_spark calcular-kpi \
        --input out/datos.jsonl --output out/kpi_por_endpoint_dia.csv
    python -m prueba_tecnica_http_client_etl_spark generar-reporte \
        --input out/kpi_por_endpoint_dia.csv \
        --output out/report/kpi_diario.html --umbral_p90 300

Differences from the reference, by design:
- outputs are Spark writer DIRECTORIES of part files (one part under
  the default --single_file; pass --no-single_file for the distributed
  layout) — the cluster-scalable shape, vs the reference's one
  open() file;
- --seed defaults to 42 (the engine's generator is deterministic by
  construction, sources/synthetic.py); the reference's unseeded default
  draws a nondeterministic corpus, which an oracle-checked engine
  deliberately does not reproduce.
"""

from __future__ import annotations

import argparse
import sys


def _spark(app: str):
    from .session import get_spark

    spark = get_spark(app)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def cmd_generar_datos(args: argparse.Namespace) -> int:
    from .sinks.files import write_jsonl
    from .sources.synthetic import generate_http_log

    spark = _spark("cli-generar-datos")
    df = generate_http_log(spark, args.n_registros, seed=args.seed)
    write_jsonl(df, args.salida, single_file=args.single_file)
    print(f"OK -> Generados {args.n_registros} registros en {args.salida} (seed={args.seed})")
    return 0


def cmd_calcular_kpi(args: argparse.Namespace) -> int:
    from .functions.cleaning import clean_http_log
    from .operators.kpi import kpi_daily
    from .sinks.files import write_kpi_csv
    from .sources.files import read_log_jsonl

    spark = _spark("cli-calcular-kpi")
    kpi = kpi_daily(clean_http_log(read_log_jsonl(spark, args.input)))
    # the reference prints the group count; one action materializes the
    # aggregate, the write reuses the same plan
    n = kpi.count()
    write_kpi_csv(kpi, args.output, single_file=args.single_file)
    print(f"OK -> KPIs generados en {args.output} (grupos={n})")
    return 0


def cmd_generar_reporte(args: argparse.Namespace) -> int:
    import os

    from .operators.report import global_metrics, report_by_endpoint
    from .sinks.report import render_html_report, render_png_charts
    from .sources.files import read_kpi_csv

    spark = _spark("cli-generar-reporte")
    kpi = read_kpi_csv(spark, args.input)
    endpoints = report_by_endpoint(kpi, p90_threshold=args.umbral_p90)
    # charts first so the report can embed their <img> references
    # (reference generar_reporte.py renders PNGs before the HTML)
    pngs = render_png_charts(endpoints, os.path.dirname(args.output) or ".")
    render_html_report(
        global_metrics(kpi),
        endpoints,
        args.output,
        chart_names=[os.path.basename(p) for p in pngs],
        p90_threshold=args.umbral_p90,
    )
    print(f"OK -> Reporte generado en {args.output} (graficos={len(pngs)})")
    return 0


def cmd_http_client(args: argparse.Namespace) -> int:
    from .sources import http as H

    spark = _spark("cli-http-client")
    transport = None if args.real else H.httpbin_like_transport
    written = H.run_http_client_stage(
        spark, base_url=args.base_url, out_dir=args.out_dir, transport=transport
    )
    print(f"OK -> Cliente HTTP completado: {len(written)} archivos en {args.out_dir}")
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m prueba_tecnica_http_client_etl_spark",
        description="Spark-native ETL pipeline CLI (reference-parity entry points)",
    )
    sub = p.add_subparsers(dest="command", required=True)

    g = sub.add_parser("generar-datos", help="genera bitacora HTTP sintetica (JSONL)")
    g.add_argument("--n_registros", type=int, required=True)
    g.add_argument("--salida", type=str, required=True)
    g.add_argument("--seed", type=int, default=42)
    g.add_argument("--single_file", action=argparse.BooleanOptionalAction, default=True)
    g.set_defaults(fn=cmd_generar_datos)

    k = sub.add_parser("calcular-kpi", help="JSONL -> KPI diario por endpoint (CSV 9 col)")
    k.add_argument("--input", required=True)
    k.add_argument("--output", required=True)
    k.add_argument("--single_file", action=argparse.BooleanOptionalAction, default=True)
    k.set_defaults(fn=cmd_calcular_kpi)

    r = sub.add_parser("generar-reporte", help="KPI CSV -> reporte HTML + PNG")
    r.add_argument("--input", required=True)
    r.add_argument("--output", required=True)
    r.add_argument("--umbral_p90", type=float, required=True)
    r.set_defaults(fn=cmd_generar_reporte)

    h = sub.add_parser(
        "http-client",
        help="secuencia de 8 tareas HTTP del cliente de referencia (JSON/XML/HTML/auth/cookies)",
    )
    h.add_argument("--out_dir", default="out")
    h.add_argument(
        "--base-url",
        dest="base_url",
        default="https://httpbin.org",
        help="base del servicio httpbin a consultar",
    )
    h.add_argument(
        "--real",
        action="store_true",
        help="usar la red real via requests (por defecto: transporte httpbin en memoria)",
    )
    h.set_defaults(fn=cmd_http_client)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
