#!/usr/bin/env python3
"""Dev benchmark: a faithful pandas replication of the reference's transform
workload (AngelRGQ/7337_sri-vehiculos-etl-airflow-bigquery,
dags/sri_vehiculos_etl_dag.py) for single-node throughput comparison
against graft's SriPipeline on the same CSV.

Replicates the reference's COMPUTE shape, not its I/O endpoints:
  - each task re-reads the CSV (the reference re-downloads the blob per
    task: 4 dim tasks + 1 fact task = 5 reads);
  - dim builds: calendar range (:62-95), 12-column dedup + clean
    (:146-185), 4-column dedup + clean (:232-265), unique-canton build
    (:320-373 — the sample's canton codes are float-styled strings that
    never hit the inline name-lookup dict, so every row takes the
    reference's CANTON_<code> / NO_IDENTIFICADA fallback branch, which is
    replicated verbatim);
  - fact: date coerce + dropna (:446-463), the four left merges with
    their J2/J3 fan-outs (:470-530), surrogate ids + metric columns;
  - BigQuery loads are replaced with local parquet writes (both engines
    write columnar output locally).

Usage: python3 tools/ref_replica.py <csv> <outDir>
Prints one line: replica_fact_rows=N replica_secs=S
"""
import sys
import time

import pandas as pd


def build_dim_tiempo():
    fechas = pd.date_range("2020-01-01", "2025-12-31", freq="D")
    dim = pd.DataFrame({
        "ID_Tiempo": range(1, len(fechas) + 1),
        "FechaCompleta": fechas.date,
        "Anio": fechas.year,
        "Trimestre": fechas.quarter,
        "Mes": fechas.month,
        "Dia": fechas.day,
        "NombreMes": fechas.strftime("%B"),
        "NombreDiaSemana": fechas.strftime("%A"),
    })
    # name translation is a dict map over 12/7 values — negligible but kept
    meses = {"January": "Enero", "February": "Febrero", "March": "Marzo",
             "April": "Abril", "May": "Mayo", "June": "Junio", "July": "Julio",
             "August": "Agosto", "September": "Septiembre", "October": "Octubre",
             "November": "Noviembre", "December": "Diciembre"}
    dias = {"Monday": "Lunes", "Tuesday": "Martes", "Wednesday": "Miércoles",
            "Thursday": "Jueves", "Friday": "Viernes", "Saturday": "Sábado",
            "Sunday": "Domingo"}
    dim["NombreMes"] = dim["NombreMes"].map(meses)
    dim["NombreDiaSemana"] = dim["NombreDiaSemana"].map(dias)
    return dim


def build_dim_vehiculo(csv):
    df = pd.read_csv(csv)  # per-task re-read, as the reference does
    cols = ["CÓDIGO DE VEHÍCULO", "MARCA", "MODELO", "PAÍS", "AÑO MODELO",
            "CLASE", "SUB CLASE", "TIPO", "CILINDRAJE", "TIPO COMBUSTIBLE",
            "COLOR 1", "COLOR 2"]
    cols = [c for c in cols if c in df.columns]
    dim = df[cols].drop_duplicates().reset_index(drop=True)
    dim["ID_Vehiculo"] = range(1, len(dim) + 1)
    for c in ["MARCA", "MODELO", "PAÍS", "CLASE", "SUB CLASE", "TIPO",
              "TIPO COMBUSTIBLE"]:
        if c in dim.columns:
            dim[c] = dim[c].astype(str).str.upper().str.strip()
    if "COLOR 2" in dim.columns:
        dim["COLOR 2"] = dim["COLOR 2"].fillna("N/A")
    dim = dim.rename(columns={"CÓDIGO DE VEHÍCULO": "CodigoVehiculo"})
    return dim


def build_dim_transaccion(csv):
    df = pd.read_csv(csv)
    cols = ["TIPO TRANSACCIÓN", "TIPO SERVICIO",
            "PERSONA NATURAL - JURÍDICA", "CATEGORÍA"]
    cols = [c for c in cols if c in df.columns]
    dim = df[cols].drop_duplicates().reset_index(drop=True)
    dim["ID_Transaccion"] = range(1, len(dim) + 1)
    for c in cols:
        dim[c] = dim[c].astype(str).str.upper().str.strip()
    dim = dim.rename(columns={"TIPO TRANSACCIÓN": "TipoTransaccion",
                              "TIPO SERVICIO": "TipoServicio",
                              "PERSONA NATURAL - JURÍDICA": "PersonaTipo",
                              "CATEGORÍA": "Categoria"})
    return dim


def build_dim_ubicacion(csv):
    df = pd.read_csv(csv)
    # dim-side probe includes 'cantón' while the fact side (below) does
    # not — replicating the reference's own asymmetric probes (:325-328
    # vs :513-517)
    col = next((c for c in ["CANTON", "CANTÓN", "canton", "cantón"]
                if c in df.columns), None)
    rows = []
    if col is not None:
        for i, codigo in enumerate(df[col].dropna().unique(), start=1):
            s = str(codigo).strip()
            rows.append({"ID_Ubicacion": i, "CodigoCanton": s,
                         "NombreCanton": f"CANTON_{s}",
                         "Provincia": "NO_IDENTIFICADA",
                         "Region": "NO_IDENTIFICADA", "Pais": "ECUADOR"})
    else:
        rows.append({"ID_Ubicacion": 1, "CodigoCanton": "99999",
                     "NombreCanton": "NO_ESPECIFICADO",
                     "Provincia": "NO_ESPECIFICADA",
                     "Region": "NO_ESPECIFICADA", "Pais": "ECUADOR"})  # :333-340 default row text
    return pd.DataFrame(rows)


def build_fact(csv, dim_tiempo, dim_vehiculo, dim_transaccion, dim_ubicacion):
    df = pd.read_csv(csv)
    # the sample's header is 'FECHA PROCESO (DD/MM/AA)', which none of the
    # reference's probes match — its fallback stamps every row with "today"
    # (:461-463); a fixed clock keeps the replica deterministic and matches
    # SriPipeline's injectable clock (2026-01-15, outside dim_tiempo range,
    # so ID_Tiempo takes the fillna(1) path exactly as the reference does)
    col_fecha = next((c for c in ["FECHA PROCESO", "FECHA_PROCESO",
                                  "fecha_proceso", "FECHA"] if c in df.columns), None)
    if col_fecha is not None:
        df["FECHA_PROCESO_CONV"] = pd.to_datetime(df[col_fecha], errors="coerce")
        df = df.dropna(subset=["FECHA_PROCESO_CONV"])
        df["FECHA_PROCESO_DATE"] = df["FECHA_PROCESO_CONV"].dt.date
    else:
        df["FECHA_PROCESO_DATE"] = pd.Timestamp("2026-01-15").date()

    df = df.merge(dim_tiempo[["ID_Tiempo", "FechaCompleta"]],
                  left_on="FECHA_PROCESO_DATE", right_on="FechaCompleta", how="left")
    df = df.merge(dim_vehiculo[["ID_Vehiculo", "CodigoVehiculo"]],
                  left_on="CÓDIGO DE VEHÍCULO", right_on="CodigoVehiculo", how="left")
    df = df.merge(dim_transaccion[["ID_Transaccion", "TipoTransaccion", "TipoServicio"]],
                  left_on=["TIPO TRANSACCIÓN", "TIPO SERVICIO"],
                  right_on=["TipoTransaccion", "TipoServicio"], how="left")
    col_canton = next((c for c in ["CANTON", "CANTÓN", "canton"]
                       if c in df.columns), None)
    if col_canton:
        df[col_canton] = df[col_canton].astype(str)
        df = df.merge(dim_ubicacion[["ID_Ubicacion", "CodigoCanton"]],
                      left_on=col_canton, right_on="CodigoCanton", how="left")
    else:
        df["ID_Ubicacion"] = 1

    df["ID_Registro"] = range(1, len(df) + 1)
    df["CantidadRegistros"] = 1
    col_avaluo = next((c for c in ["AVALUO", "AVALÚO", "avaluo", "avalúo"]
                       if c in df.columns), None)
    if col_avaluo:
        df["Avaluo"] = pd.to_numeric(df[col_avaluo], errors="coerce").fillna(0)
    else:
        df["Avaluo"] = 0.0
    for c in ["ID_Tiempo", "ID_Vehiculo", "ID_Transaccion", "ID_Ubicacion"]:
        df[c] = df[c].fillna(1).astype("int64")
    return df[["ID_Registro", "ID_Tiempo", "ID_Vehiculo", "ID_Transaccion",
               "ID_Ubicacion", "CantidadRegistros", "Avaluo"]]


def main():
    csv, out = sys.argv[1], sys.argv[2]
    t0 = time.time()
    dt = build_dim_tiempo()
    dv = build_dim_vehiculo(csv)
    dtr = build_dim_transaccion(csv)
    du = build_dim_ubicacion(csv)
    fact = build_fact(csv, dt, dv, dtr, du)
    for name, frame in [("dim_tiempo", dt), ("dim_vehiculo", dv),
                        ("dim_transaccion", dtr), ("dim_ubicacion", du),
                        ("fact_registro_vehiculos", fact)]:
        frame.to_parquet(f"{out}/{name}.parquet", index=False)
    secs = time.time() - t0
    print(f"replica_fact_rows={len(fact)} replica_secs={secs:.1f} "
          f"dims={len(dt)}/{len(dv)}/{len(dtr)}/{len(du)}")


if __name__ == "__main__":
    main()
