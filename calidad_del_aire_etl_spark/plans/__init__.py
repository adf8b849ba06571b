"""Declarative pipeline plans: the reference's Airflow DAG re-expressed
as composed DataFrame stages."""
