import time, sys
sys.path.insert(0,'/root/repo')
import __spark_entry__ as E
from mcp_synaptic_spark.session import get_spark
spark = get_spark('bisect')
spark.sparkContext.setLogLevel('ERROR')
sf='/root/testdata/sf0.1'
qs = E.queries()
names = list(qs)
pre = sys.argv[1].split(',') if len(sys.argv)>1 and sys.argv[1] else []
for name in pre:
    qs[name](spark, sf).collect()
t0=time.perf_counter(); qs['embed_texts'](spark, sf).collect()
print('PRE=',pre,'-> embed_texts', round(time.perf_counter()-t0,2))
