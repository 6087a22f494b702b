import time, sys
sys.path.insert(0,'/root/repo')
import __spark_entry__ as E
from mcp_synaptic_spark.session import get_spark
spark = get_spark('bisect2')
spark.sparkContext.setLogLevel('ERROR')
sf='/root/testdata/sf0.1'
qs = E.queries()
E._ivf_index(spark, sf)
t0=time.perf_counter(); qs['embed_texts'](spark, sf).collect()
print('after ivf_index -> embed_texts', round(time.perf_counter()-t0,2))
t0=time.perf_counter(); qs['multimodal_features'](spark, sf).collect()
print('after ivf_index -> multimodal ', round(time.perf_counter()-t0,2))
