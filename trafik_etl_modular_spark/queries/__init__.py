"""Named query modules. Importing a module registers its queries in
:mod:`trafik_etl_modular_spark.registry`."""
