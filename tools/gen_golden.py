import sys, types, importlib.util
import numpy as np

def fake_module(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items(): setattr(m, k, v)
    sys.modules[name] = m
    return m

fake_module('requests', Session=object)
fake_module('requests.exceptions', ConnectionError=Exception)
fake_module('googlemaps', Client=object)
fake_module('scipy'); fake_module('scipy.stats', mode=lambda x: None)
class _FakeDBSCAN:
    def __init__(self, *a, **k): pass
fake_module('sklearn'); fake_module('sklearn.cluster', DBSCAN=_FakeDBSCAN)
class _Col:
    def __init__(self, *a, **k): pass
def _noop(*a, **k): return None
fake_module('sqlalchemy', and_=_noop, create_engine=_noop,
            Column=_Col, String=_Col, Float=_Col, DateTime=_Col)
fake_module('sqlalchemy.orm', sessionmaker=lambda **k: (lambda: None))
fake_module('sqlalchemy.exc', IntegrityError=Exception)
class _Base:
    metadata = types.SimpleNamespace(create_all=_noop)
fake_module('sqlalchemy.ext.declarative', declarative_base=lambda: _Base)
class _tqdm:
    def __init__(self, it=None, **k): self.it = it
    def __iter__(self): return iter(self.it)
    @staticmethod
    def pandas(*a, **k): pass
fake_module('tqdm', tqdm=_tqdm)

# minimal gscap.utils surface used by process_velocities (geo_distance per
# utils.py:204-228 semantics — haversine, R=6371 km, meters)
def geo_distance(lat1, lon1, lat2, lon2):
    r = 6371.0
    lat1, lon1 = np.radians(lat1), np.radians(lon1)
    lat2, lon2 = np.radians(lat2), np.radians(lon2)
    dlon = lon2 - lon1
    dlat = lat2 - lat1
    a = np.sin(dlat/2)**2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon/2)**2
    c = 2 * np.arctan2(np.sqrt(a), np.sqrt(1 - a))
    return r*c*1000

def isint(x):
    try: int(str(x)); return True
    except ValueError: return False
def isfloat(x):
    try: float(str(x)); return True
    except ValueError: return False
def dpath(x): return '/tmp/' + str(x)

pkg = fake_module('gscap'); pkg.__path__ = ['/root/reference/gscap']
import pandas as _pd, os as _os
from pathlib import Path as _Path
fake_module('gscap.utils', geo_distance=geo_distance, isint=isint,
            isfloat=isfloat, dpath=dpath, CONFIG={},
            pd=_pd, np=np, os=_os, sys=sys, Path=_Path)

spec = importlib.util.spec_from_file_location('gscap.gps', '/root/reference/gscap/gps.py')
gps = importlib.util.module_from_spec(spec)
sys.modules['gscap.gps'] = gps
spec.loader.exec_module(gps)

import pandas as pd
df = pd.read_csv('/root/reference/tests/some_data.csv', parse_dates=['ts'])
df = df[['lat', 'lon', 'ts']]
out = gps.process_velocities(df, verbose=False)
out = out[['lat', 'lon', 'ts', 'binning', 'displacement', 'time_delta', 'velocity']]
out.to_csv('/root/repo/src/test/resources/golden_velocities.csv', index=False)
print(out.binning.value_counts().to_dict())
print(len(out), 'rows')
