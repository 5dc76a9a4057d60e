package graft.ml

import org.apache.spark.ml.feature.{Word2Vec, Word2VecModel}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * In-engine embedding training (MLlib Word2Vec skip-gram) — the
 * producer side of the similarity stack: [[graft.ops.SimSearch]]'s
 * ANN/near-dup/hard-negative operators consume an `Array[Float]`
 * column, and a library that can only CONSUME embeddings leaves the
 * most common question ("embed my own corpus") to an external tool.
 * Token semantics are [[graft.ops.Dedup.normalizedTokens]] (the
 * repo-wide contract), so trained vectors key on exactly the tokens
 * the dedup/LM operators see.
 *
 * Determinism contract: with `numPartitions = 1` the skip-gram
 * updates apply in one deterministic sequence per `seed`, so
 * training is bit-reproducible run-to-run — the property the
 * fixture tests pin. Production scale trades that for parallelism
 * (numPartitions > 1 makes updates racy by design — Spark's own
 * contract); pin seeds for experiments, not for byte-identity.
 *
 * Scale shape: Word2Vec driver state is the vocabulary × dim float
 * matrix (bounded by maxVocabSize below, loud), NOT the corpus; each
 * iteration is one mapPartitions pass over the tokenized corpus.
 * Document vectors are the model's token-average transform — map-only
 * once the (small) vector table broadcasts.
 */
object Embeddings {

  /** Train a Word2Vec model over `textCol`. `minCount` prunes the
    * vocabulary tail; `maxVocabSize` is the loud driver-memory guard
    * (vectorSize × vocab floats live on the driver and broadcast).
    *
    * Choosing `numPartitions`: 1 is bit-deterministic per seed (the
    * fixture/oracle contract — q162 depends on it); >1 applies
    * gradient updates Hogwild-style, so only AGGREGATE properties are
    * stable (the vocabulary set, which is count-derived and exact at
    * any parallelism, and the neighbor topology of well-separated
    * topics — MLSpec pins both at numPartitions=3). Rule of thumb:
    * stay serial while one iteration's token stream fits your wall
    * budget (~10M tokens/min/core order of magnitude); past that —
    * any real corpus — set numPartitions ≈ executor cores, pin the
    * seed for experiment bookkeeping, and treat vectors as
    * statistically, not byte-, reproducible. Never gate a dedup or
    * split decision on byte-identity of parallel-trained vectors. */
  def trainWord2Vec(df: DataFrame, textCol: String, dim: Int = 32,
                    minCount: Int = 5, maxIter: Int = 1,
                    windowSize: Int = 5, seed: Long = 7L,
                    numPartitions: Int = 1,
                    maxVocabSize: Int = 1000000): Word2VecModel = {
    require(dim > 0 && minCount >= 1 && maxIter >= 1 && numPartitions >= 1,
      "dim/minCount/maxIter/numPartitions must be positive")
    val toks = df
      .select(graft.ops.Dedup.normalizedTokens(col(textCol)).as("tokens"))
      .where(size(col("tokens")) > 0)
    val model = new Word2Vec()
      .setInputCol("tokens").setOutputCol("vec")
      .setVectorSize(dim).setMinCount(minCount).setMaxIter(maxIter)
      .setWindowSize(windowSize).setSeed(seed)
      .setNumPartitions(numPartitions)
      .fit(toks)
    val vocab = model.getVectors.count()
    require(vocab <= maxVocabSize,
      s"vocabulary $vocab exceeds maxVocabSize=$maxVocabSize — raise " +
        "minCount before training at this scale")
    model
  }

  /** Document vectors: the model's token-average transform, emitted
    * as the `Array[Float]` embedding column the [[graft.ops.SimSearch]]
    * family consumes (4-decimal rounding — the repo's cross-engine
    * float boundary; docs with no in-vocabulary tokens embed as the
    * zero vector, MLlib's own convention). */
  def docVectors(model: Word2VecModel, df: DataFrame, idCol: String,
                 textCol: String, outCol: String = "embedding"): DataFrame = {
    require(!df.columns.contains(outCol),
      s"input column $outCol already exists")
    val toks = df.select(col(idCol),
      graft.ops.Dedup.normalizedTokens(col(textCol)).as("tokens"))
    model.setInputCol("tokens").setOutputCol("__w2v")
      .transform(toks)
      .select(col(idCol),
        transform(vector_to_array(col("__w2v")),
          x => round(x, 4).cast("float")).as(outCol))
  }

  /** Top-k nearest vocabulary words to a probe word by the model's
    * cosine — the sanity probe every embedding training run logs.
    * Deterministic tie-break on the word. */
  def synonyms(model: Word2VecModel, word: String, k: Int): DataFrame =
    model.findSynonyms(word, k)
      .select(col("word"), round(col("similarity"), 4).as("similarity"))
      .orderBy(desc("similarity"), col("word"))
}
