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
            Column=_Col, String=_Col, Float=_Col, DateTime=_Col,
            Date=_Col, Time=_Col, Integer=_Col)
fake_module('sqlalchemy.orm', sessionmaker=lambda **k: (lambda: None))
fake_module('sqlalchemy.exc', IntegrityError=Exception)
class _Base:
    metadata = types.SimpleNamespace(create_all=_noop)
fake_module('sqlalchemy.ext', )
fake_module('sqlalchemy.ext.declarative', declarative_base=lambda: _Base)
fake_module('sqlalchemy.ext.hybrid', hybrid_property=property)
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

# ---- additional goldens ----------------------------------------------------
import math
import pandas as pd

# 2. resample_gps_intervals over some_data (lat/lon/ts only)
df2 = pd.read_csv('/root/reference/tests/some_data.csv', parse_dates=['ts'])[['lat', 'lon', 'ts']]
rs = gps.resample_gps_intervals(df2.copy())
rs.to_csv('/root/repo/src/test/resources/golden_resample.csv', index=False)
print('resample rows:', len(rs))

# 3. impute_stationary_coordinates over some_gps (whole-minute fixture)
sg = pd.read_csv('/root/reference/tests/some_gps.csv', parse_dates=['ts'])[['lat', 'lon', 'ts']]
imp = gps.impute_stationary_coordinates(sg.copy(), freq='10Min', verbose=False)
imp = imp[['lat', 'lon', 'ts', 'binning', 'displacement', 'time_delta', 'velocity']]
imp.to_csv('/root/repo/src/test/resources/golden_impute.csv', index=False)
print('impute rows:', len(imp), imp.binning.value_counts().to_dict())

# 4. get_cluster_times over enriched some_data: velocities + deterministic cid
import gscap
enr = gps.process_velocities(df2.copy(), verbose=False)
enr['date'] = enr.ts.apply(lambda t: t.date())
enr['cid'] = ['x%d' % (int(math.floor(la * 1e5)) % 3) for la in enr.lat]
# stub tz lookup (zips.txt blob is absent); compared columns exclude local_tz
sys.modules['gscap.utils'].tz_from_dd = lambda x: ['America/Los_Angeles'] * len(x)
gps.tz_from_dd = lambda x: ['America/Los_Angeles'] * len(x)
entries = gps.get_cluster_times(enr.copy())
entries['duration_s'] = entries['duration'].dt.total_seconds()
entries[['cid', 'date', 'time_in', 'midpoint', 'time_out', 'duration_s',
         'pos', 'n_points', 'lat', 'lon']].to_csv(
    '/root/repo/src/test/resources/golden_entries.csv', index=False)
print('entries rows:', len(entries))

# 5. cluster_metrics over the reference's own fixtures
ent = pd.read_csv('/root/reference/tests/some_entries.csv', parse_dates=['time_in', 'time_out', 'midpoint'])
ent['duration'] = pd.to_timedelta(ent['duration'])
clusters = pd.read_csv('/root/reference/tests/some_clusters.csv')
cm = gps.cluster_metrics(clusters.copy(), ent.copy())
cm.to_csv('/root/repo/src/test/resources/golden_cluster_metrics.csv', index=False)
print('cluster_metrics rows:', len(cm), list(cm.columns))

# 6. get_daily_metrics over the enriched frame (same cid scheme as entries)
daily = gps.get_daily_metrics(enr.copy())
daily.to_csv('/root/repo/src/test/resources/golden_daily.csv', index=False)
print('daily rows:', len(daily), list(daily.columns))

# 7. weather summarize_report over a deterministic hourly frame
import importlib.util as _ilu
spec_w = _ilu.spec_from_file_location('gscap.weather', '/root/reference/gscap/weather.py')
weather = _ilu.module_from_spec(spec_w)
sys.modules['gscap.weather'] = weather
spec_w.loader.exec_module(weather)

rows = []
for e in range(72):  # 3 synthetic days × 24 hours
    rows.append(dict(
        cloudCover=(e * 7) % 100 / 100.0 if e % 11 else np.nan,  # some NaNs
        dewPoint=(e * 11) % 150 / 10.0,
        humidity=(e * 3) % 100 / 100.0,
        temperature=e % 200 / 10.0,
        precipIntensity=(e * 13) % 20 / 20.0,
        icon='x'))
frames = [pd.DataFrame(rows[i*24:(i+1)*24]) for i in range(3)]
import collections
Req = collections.namedtuple('Req', ['date', 'lat', 'lon', 'zipcode'])
outs = []
for i, f in enumerate(frames):
    ri = Req(date=f'2019-06-0{i+1}', lat=38.1, lon=-86.9, zipcode=47579)
    r = weather.summarize_report((dict(report=f, hits=1, misses=0), ri))
    outs.append(r['report'])
pd.DataFrame(outs).to_csv('/root/repo/src/test/resources/golden_weather.csv', index=False)
print('weather golden rows:', len(outs))
