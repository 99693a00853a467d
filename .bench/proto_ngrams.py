# Prototype: zip-slice _word_ngrams vs transform-slice — value equality + speed
def word_ngrams_v2(tokens, n):
    cnt = F.greatest(F.size(tokens) - F.lit(n - 1), F.lit(0))
    zipped = F.arrays_zip(*[F.slice(tokens, i + 1, cnt).alias(f"t{i}") for i in range(n)])
    return F.transform(zipped, lambda g: F.concat_ws(" ", *[g[f"t{i}"] for i in range(n)]))

from cdc_pipeline_with_kafka_spark.operators.textstats import _tokens, _word_ngrams
toks = _tokens(F.col('text'))
K = 10
old_g = docs.select('doc_id', F.posexplode_outer(_word_ngrams(toks, K)).alias('start','gram')).filter(F.col('gram').isNotNull()).select('doc_id','start',F.md5('gram').alias('whash'))
new_g = docs.select('doc_id', F.posexplode_outer(word_ngrams_v2(toks, K)).alias('start','gram')).filter(F.col('gram').isNotNull()).select('doc_id','start',F.md5('gram').alias('whash'))
print('hash old:', hashdf(old_g)); print('hash new:', hashdf(new_g))
print([(time_noop(old_g,2), time_noop(new_g,2)) for _ in range(3)])
