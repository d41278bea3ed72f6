# mod_wsgi deployment artifact — reference parity with app.wsgi:1-3
# (the reference inserts its checkout on sys.path and exposes Flask's
# ``app`` as ``application``; here the engine's precomputed-export
# serving tier is exposed the same way, configured by environment:
#   SetEnv OWDW_EXPORT_DIR /srv/wells_export
#   SetEnv OWDW_STATIC_DIR /srv/static      (optional)
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
from oil_wells_data_wrangling_spark.wsgi import application  # noqa: F401,E402
