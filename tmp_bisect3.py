import time, sys
sys.path.insert(0,'/root/repo')
import __spark_entry__ as E
from mcp_synaptic_spark.sources.tables import load_table
from mcp_synaptic_spark.session import get_spark
import pyspark.sql.functions as F
spark = get_spark('bisect3')
spark.sparkContext.setLogLevel('ERROR')
sf='/root/testdata/sf0.1'
qs = E.queries(); names=list(qs)
E.queries()['rag_search'](spark, sf).collect()
E._ivf_index(spark, sf)
for name in names[:names.index('embed_texts')]:
    qs[name](spark, sf).collect()
docs = load_table(spark, sf, 'documents')
t0=time.perf_counter(); n = docs.rdd.getNumPartitions(); print('rdd probe', round(time.perf_counter()-t0,2), 'parts', n)
t0=time.perf_counter(); docs.repartition(32).count(); print('repartition+count', round(time.perf_counter()-t0,2))
from mcp_synaptic_spark.sources.embedders import hash_embedder
t0=time.perf_counter(); out = hash_embedder(docs, dim=64); print('build plan', round(time.perf_counter()-t0,2))
t0=time.perf_counter(); out.select('doc_id').collect(); print('mapInPandas collect ids', round(time.perf_counter()-t0,2))
t0=time.perf_counter()
res = out.select('doc_id', F.size('embedding').alias('dim'), F.round(F.aggregate(F.col('embedding'), F.lit(0.0), lambda a,x: a+x*x),3).alias('sq_norm'))
res.collect(); print('full q collect', round(time.perf_counter()-t0,2))
t0=time.perf_counter(); res.collect(); print('full q collect again', round(time.perf_counter()-t0,2))
