"""BM25 scoring kernels, float32-faithful to the Lucene 8.x reference.

Behavioral reference (re-implemented, not ported):
- idf = (float) log(1 + (docCount - docFreq + 0.5) / (docFreq + 0.5))
  [BM25Similarity.java:74-76 in solr-8.4.0/lucene/core]
- avgdl = (float)(sumTotalTermFreq / (double) docCount)  [:88-90]
- 256-entry LENGTH_TABLE of byte4ToInt decoded norms     [:119-126]
- per-term cache[i] = 1f / (k1 * ((1 - b) + b * LENGTH_TABLE[i] / avgdl))
  computed per (collection stats, term) scorer            [:196-206]
- score(freq, norm) = weight - weight / (1 + freq * normInverse), with
  weight = boost * idf — NOT the algebraically-equal freq/(freq+norm) form;
  the rewrite guarantees monotonicity in float32          [:252-264]
- parameter validation k1 finite >= 0, b in [0,1]         [:50-58]

Every arithmetic step here is performed in numpy float32 in the same
operation order, so scores are bit-comparable to the Java floats.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .smallfloat import BYTE4_DECODE_TABLE

__all__ = [
    "BM25",
    "BM25TermWeight",
    "LegacyBM25",
    "LegacyBM25TermWeight",
    "ClassicSimilarity",
    "ClassicTermWeight",
    "LMDirichlet",
    "LMDirichletTermWeight",
    "DFRSimilarity",
    "DFRTermWeight",
    "IBSimilarity",
    "IBTermWeight",
    "DFISimilarity",
    "DFITermWeight",
    "AxiomaticSimilarity",
    "AxiomaticTermWeight",
    "LENGTH_TABLE",
    "get_similarity",
]

# float32 decode of the 256 norm bytes (doc lengths)
LENGTH_TABLE = BYTE4_DECODE_TABLE.astype(np.float32)


@dataclass(frozen=True)
class BM25TermWeight:
    """Per-(term, collection) scoring state: weight + 256-entry norm cache."""

    weight: np.float32
    cache: np.ndarray  # float32[256]: 1 / (k1 * ((1-b) + b*len/avgdl))

    def score(self, freqs, norm_bytes) -> np.ndarray:
        """Vectorized float32 score for parallel freq/norm arrays."""
        freqs = np.asarray(freqs)
        f32 = freqs.astype(np.float32, copy=False)
        norm_inverse = self.cache[np.asarray(norm_bytes, dtype=np.uint8)]
        one = np.float32(1.0)
        return self.weight - self.weight / (one + f32 * norm_inverse)

    def score_scalar(self, freq: float, norm_byte: int) -> float:
        return float(self.score(np.array([freq]), np.array([norm_byte]))[0])

    def max_score(self, imp_freqs, imp_norms) -> float:
        """Max score over competitive (freq, norm) impact pairs.

        Mirrors MaxScoreCache.computeMaxScore (MaxScoreCache.java:62-68):
        max over score(freq, norm) of the stored pareto pairs.
        """
        if len(imp_freqs) == 0:
            return 0.0
        return float(self.score(imp_freqs, imp_norms).max())


class BM25:
    """BM25 similarity with the 8.x defaults k1=1.2, b=0.75."""

    def __init__(self, k1: float = 1.2, b: float = 0.75):
        if not np.isfinite(k1) or k1 < 0:
            raise ValueError(f"illegal k1 value: {k1}, must be a non-negative finite value")
        if np.isnan(b) or b < 0 or b > 1:
            raise ValueError(f"illegal b value: {b}, must be between 0 and 1")
        self.k1 = np.float32(k1)
        self.b = np.float32(b)

    @staticmethod
    def idf(doc_freq, doc_count) -> np.float32:
        """(float) log(1 + (N - n + 0.5) / (n + 0.5)), inner math in float64."""
        df = np.float64(doc_freq)
        n = np.float64(doc_count)
        return np.float32(np.log(1.0 + (n - df + 0.5) / (df + 0.5)))

    @staticmethod
    def avgdl(sum_total_term_freq: int, doc_count: int) -> np.float32:
        return np.float32(np.float64(sum_total_term_freq) / np.float64(doc_count))

    def norm_cache(self, avgdl: np.float32) -> np.ndarray:
        """cache[i] = 1f / (k1 * ((1 - b) + b * LENGTH_TABLE[i] / avgdl))."""
        one = np.float32(1.0)
        # float32 op order: b * len -> / avgdl -> + (1-b) -> * k1 -> 1/x.
        # k1=0 yields +inf entries — correct: score then saturates to weight.
        with np.errstate(divide="ignore"):
            return one / (self.k1 * ((one - self.b) + self.b * LENGTH_TABLE / np.float32(avgdl)))

    def term_weight(
        self,
        doc_freq: int,
        doc_count: int,
        sum_total_term_freq: int,
        boost: float = 1.0,
        ttf: int | None = None,
    ) -> BM25TermWeight:
        # ttf (the term's totalTermFreq) is part of the Similarity SPI
        # (TermStatistics) but unused by BM25 — LMDirichlet consumes it
        idf = self.idf(doc_freq, doc_count)
        weight = np.float32(boost) * idf
        cache = self.norm_cache(self.avgdl(sum_total_term_freq, doc_count))
        return BM25TermWeight(weight=weight, cache=cache)


@dataclass(frozen=True)
class LegacyBM25TermWeight:
    """7.x BM25 per-(term, collection) state (BM25Similarity.java:257-294
    in solr-7.5.0/lucene/core, re-implemented): weightValue = boost * idf
    * (k1 + 1); cache[i] = k1 * ((1 - b) + b * LENGTH_TABLE[i] / avgdl);
    score = weightValue * freq / (freq + cache[norm])."""

    weight_value: np.float32
    cache: np.ndarray  # float32[256]: k1 * ((1-b) + b*len/avgdl)

    def score(self, freqs, norm_bytes) -> np.ndarray:
        f32 = np.asarray(freqs).astype(np.float32, copy=False)
        norm = self.cache[np.asarray(norm_bytes, dtype=np.uint8)]
        return (self.weight_value * f32) / (f32 + norm)

    def score_scalar(self, freq: float, norm_byte: int) -> float:
        return float(self.score(np.array([freq]), np.array([norm_byte]))[0])

    def max_score(self, imp_freqs, imp_norms) -> float:
        if len(imp_freqs) == 0:
            return 0.0
        return float(self.score(imp_freqs, imp_norms).max())


class LegacyBM25(BM25):
    """The Lucene 7.x BM25 formula (solr-7.5.0 BM25Similarity.java:284-294):
    same idf/avgdl as 8.x, but the (k1 + 1) numerator is kept (the 8.0
    change dropped it as rank-preserving) and the norm cache stores the
    denominator addend directly instead of its reciprocal."""

    def term_weight(
        self,
        doc_freq: int,
        doc_count: int,
        sum_total_term_freq: int,
        boost: float = 1.0,
        ttf: int | None = None,
    ) -> LegacyBM25TermWeight:
        one = np.float32(1.0)
        weight = np.float32(self.idf(doc_freq, doc_count) * np.float32(boost))
        avgdl = self.avgdl(sum_total_term_freq, doc_count)
        # float32 op order per the Java expression
        # k1 * ((1 - b) + b * LENGTH_TABLE[i] / avgdl)
        cache = self.k1 * ((one - self.b) + self.b * LENGTH_TABLE / np.float32(avgdl))
        return LegacyBM25TermWeight(
            weight_value=np.float32(weight * (self.k1 + one)), cache=cache
        )


def _classic_norm_table() -> np.ndarray:
    """TFIDFSimilarity.scorer's normTable (solr-8.4.0
    TFIDFSimilarity.java:523-529): normTable[i] =
    (float)(1.0 / sqrt(byte4ToInt(i))) for i >= 1; normTable[0] =
    1f / normTable[255]."""
    lengths = BYTE4_DECODE_TABLE.astype(np.float64)
    nt = np.empty(256, dtype=np.float32)
    with np.errstate(divide="ignore"):
        nt[1:] = (1.0 / np.sqrt(lengths[1:])).astype(np.float32)
    nt[0] = np.float32(1.0) / nt[255]
    return nt


_CLASSIC_NORM_TABLE = _classic_norm_table()


@dataclass(frozen=True)
class ClassicTermWeight:
    """ClassicSimilarity (TFIDF) per-term state (solr-8.4.0
    TFIDFSimilarity.java:538-560 + ClassicSimilarity.java:44-72,
    re-implemented): queryWeight = boost * idf with idf =
    (float)(log((N+1)/(df+1)) + 1); score = (sqrtf(freq) * queryWeight)
    * normTable[norm]."""

    query_weight: np.float32
    norm_table: np.ndarray = None  # float32[256], defaulted below

    def __post_init__(self):
        if self.norm_table is None:
            object.__setattr__(self, "norm_table", _CLASSIC_NORM_TABLE)

    def score(self, freqs, norm_bytes) -> np.ndarray:
        f64 = np.asarray(freqs).astype(np.float64, copy=False)
        tf = np.sqrt(f64).astype(np.float32)  # (float) Math.sqrt(freq)
        raw = tf * self.query_weight
        return raw * self.norm_table[np.asarray(norm_bytes, dtype=np.uint8)]

    def score_scalar(self, freq: float, norm_byte: int) -> float:
        return float(self.score(np.array([freq]), np.array([norm_byte]))[0])

    def max_score(self, imp_freqs, imp_norms) -> float:
        if len(imp_freqs) == 0:
            return 0.0
        return float(self.score(imp_freqs, imp_norms).max())


class ClassicSimilarity:
    """The classic Lucene TFIDF similarity (ClassicSimilarity.java:44-72):
    tf = sqrt(freq), idf = log((N+1)/(df+1)) + 1, lengthNorm =
    1/sqrt(length) via the shared byte4 norm encoding."""

    @staticmethod
    def idf(doc_freq, doc_count) -> np.float32:
        # (float)(Math.log((docCount+1) / (double)(docFreq+1)) + 1.0)
        return np.float32(
            np.log(np.float64(doc_count + 1) / np.float64(doc_freq + 1)) + 1.0
        )

    def term_weight(
        self,
        doc_freq: int,
        doc_count: int,
        sum_total_term_freq: int,
        boost: float = 1.0,
        ttf: int | None = None,
    ) -> ClassicTermWeight:
        return ClassicTermWeight(
            query_weight=np.float32(np.float32(boost) * self.idf(doc_freq, doc_count))
        )


@dataclass(frozen=True)
class SweetSpotTermWeight:
    """SweetSpotSimilarity per-term state (s84 misc/src/java/org/apache/
    lucene/misc/SweetSpotSimilarity.java): classic TFIDF queryWeight with
    the baselineTf tf curve (java:188-196: freq <= tf_min -> tf_base, else
    (float)sqrt(freq + tf_base^2 - tf_min); 0 freq -> 0) and the plateau
    lengthNorm baked into the norm table. The java inner float arithmetic
    (freq + base^2 - min) is exact at these magnitudes, so the double-path
    computation here is bit-identical."""

    query_weight: np.float32
    norm_table: np.ndarray
    tf_base: np.float32
    tf_min: np.float32

    def score(self, freqs, norm_bytes) -> np.ndarray:
        f = np.asarray(freqs).astype(np.float64, copy=False)
        base2 = np.float64(self.tf_base) * np.float64(self.tf_base)
        tf = np.where(
            f <= np.float64(self.tf_min),
            self.tf_base,
            np.sqrt(f + base2 - np.float64(self.tf_min)).astype(np.float32),
        ).astype(np.float32)
        tf = np.where(f == 0.0, np.float32(0.0), tf)
        raw = tf * self.query_weight
        return raw * self.norm_table[np.asarray(norm_bytes, dtype=np.uint8)]

    def score_scalar(self, freq: float, norm_byte: int) -> float:
        return float(self.score(np.array([freq]), np.array([norm_byte]))[0])

    def max_score(self, imp_freqs, imp_norms) -> float:
        if len(imp_freqs) == 0:
            return 0.0
        return float(self.score(imp_freqs, imp_norms).max())


class SweetSpotSimilarity(ClassicSimilarity):
    """SweetSpotSimilarity (s84 misc/.../SweetSpotSimilarity.java:55):
    ClassicSimilarity with a tunable tf baseline and a plateau lengthNorm
    — lengthNorm(len) = (float)(1f / sqrt(steepness * (|len - min| +
    |len - max| - (max - min)) + 1f)) (java:139-147), flat 1.0 inside
    [min, max]. The norm table follows TFIDFSimilarity.scorer's
    construction (lengthNorm over byte4-decoded lengths, table[0] =
    1f / table[255])."""

    def __init__(self, ln_min: int = 1, ln_max: int = 1,
                 steepness: float = 0.5, tf_base: float = 0.0,
                 tf_min: float = 0.0):
        if ln_min > ln_max:
            raise ValueError(f"min={ln_min} > max={ln_max}")
        self.ln_min, self.ln_max = int(ln_min), int(ln_max)
        self.steepness = np.float32(steepness)
        self.tf_base, self.tf_min = np.float32(tf_base), np.float32(tf_min)
        lengths = BYTE4_DECODE_TABLE.astype(np.int64)
        abs_sum = (
            np.abs(lengths - self.ln_min)
            + np.abs(lengths - self.ln_max)
            - (self.ln_max - self.ln_min)
        ).astype(np.float32)
        inner = self.steepness * abs_sum + np.float32(1.0)
        nt = (1.0 / np.sqrt(inner.astype(np.float64))).astype(np.float32)
        nt[0] = np.float32(1.0) / nt[255]
        self._norm_table = nt

    def term_weight(
        self,
        doc_freq: int,
        doc_count: int,
        sum_total_term_freq: int,
        boost: float = 1.0,
        ttf: int | None = None,
    ) -> SweetSpotTermWeight:
        return SweetSpotTermWeight(
            query_weight=np.float32(np.float32(boost) * self.idf(doc_freq, doc_count)),
            norm_table=self._norm_table,
            tf_base=self.tf_base,
            tf_min=self.tf_min,
        )


@dataclass(frozen=True)
class LMDirichletTermWeight:
    """LMDirichlet per-(term, collection) state (s84
    LMDirichletSimilarity.java:83-87 + LMSimilarity.java:172-174,
    SimilarityBase.score(float freq, long norm) -> (float) double-score):
    p = (ttf + 1) / (sumTotalTermFreq + 1) in DOUBLE; score =
    max(0, boost * (ln(1 + freq/(mu*p)) + ln(mu/(docLen + mu)))) cast to
    float32; docLen = the byte4-decoded length."""

    boost: np.float64
    mu: np.float64
    collection_p: np.float64

    def score(self, freqs, norm_bytes) -> np.ndarray:
        f = np.asarray(freqs).astype(np.float64, copy=False)
        dl = BYTE4_DECODE_TABLE[np.asarray(norm_bytes, dtype=np.uint8)].astype(
            np.float64
        )
        s = self.boost * (
            np.log(1.0 + f / (self.mu * self.collection_p))
            + np.log(self.mu / (dl + self.mu))
        )
        return np.maximum(s, 0.0).astype(np.float32)

    def score_scalar(self, freq: float, norm_byte: int) -> float:
        return float(self.score(np.array([freq]), np.array([norm_byte]))[0])

    def max_score(self, imp_freqs, imp_norms) -> float:
        if len(imp_freqs) == 0:
            return 0.0
        return float(self.score(imp_freqs, imp_norms).max())


class LMDirichlet:
    """LM with Dirichlet smoothing (LMDirichletSimilarity, default
    mu=2000). Needs the term's totalTermFreq — callers pass it via the
    ``ttf`` keyword of term_weight (TermStatistics.totalTermFreq)."""

    def __init__(self, mu: float = 2000.0):
        if not np.isfinite(mu) or mu < 0:
            raise ValueError(f"illegal mu value: {mu}, must be a non-negative finite value")
        self.mu = np.float64(np.float32(mu))  # Java stores mu as float

    def term_weight(
        self,
        doc_freq: int,
        doc_count: int,
        sum_total_term_freq: int,
        boost: float = 1.0,
        ttf: int | None = None,
    ) -> LMDirichletTermWeight:
        if ttf is None:
            raise ValueError("LMDirichlet requires the term's totalTermFreq (ttf=)")
        p = (np.float64(ttf) + 1.0) / (np.float64(sum_total_term_freq) + 1.0)
        return LMDirichletTermWeight(
            boost=np.float64(np.float32(boost)), mu=self.mu, collection_p=p
        )


@dataclass(frozen=True)
class LMJelinekMercerTermWeight:
    """LM Jelinek-Mercer per-(term, collection) state (s84
    LMJelinekMercerSimilarity.java:70-75 + LMSimilarity
    DefaultCollectionModel.computeProbability + SimilarityBase.score
    float cast & zero clamp): p = (ttf + 1) / (sumTotalTermFreq + 1) in
    DOUBLE; score = max(0, boost * ln(1 + ((1-λ)·freq/docLen)/(λ·p)))
    cast to float32; docLen = the byte4-decoded length."""

    boost: np.float64
    lam: np.float64
    collection_p: np.float64

    def score(self, freqs, norm_bytes) -> np.ndarray:
        f = np.asarray(freqs).astype(np.float64, copy=False)
        dl = BYTE4_DECODE_TABLE[np.asarray(norm_bytes, dtype=np.uint8)].astype(
            np.float64
        )
        s = self.boost * np.log(
            1.0 + ((1.0 - self.lam) * f / dl) / (self.lam * self.collection_p)
        )
        return np.maximum(s, 0.0).astype(np.float32)

    def score_scalar(self, freq: float, norm_byte: int) -> float:
        return float(self.score(np.array([freq]), np.array([norm_byte]))[0])

    def max_score(self, imp_freqs, imp_norms) -> float:
        if len(imp_freqs) == 0:
            return 0.0
        return float(self.score(imp_freqs, imp_norms).max())


class LMJelinekMercer:
    """LM with Jelinek-Mercer smoothing (LMJelinekMercerSimilarity;
    λ near 0.1 for title queries, 0.7 for long queries per the class
    javadoc). Needs the term's totalTermFreq via ``ttf``."""

    def __init__(self, lam: float = 0.1):
        if not (0.0 < lam <= 1.0):
            raise ValueError(
                f"illegal lambda value: {lam}, must be in (0, 1]"
            )
        self.lam = np.float64(np.float32(lam))  # Java stores lambda as float

    def term_weight(
        self,
        doc_freq: int,
        doc_count: int,
        sum_total_term_freq: int,
        boost: float = 1.0,
        ttf: int | None = None,
    ) -> LMJelinekMercerTermWeight:
        if ttf is None:
            raise ValueError(
                "LMJelinekMercer requires the term's totalTermFreq (ttf=)"
            )
        p = (np.float64(ttf) + 1.0) / (np.float64(sum_total_term_freq) + 1.0)
        return LMJelinekMercerTermWeight(
            boost=np.float64(np.float32(boost)), lam=self.lam, collection_p=p
        )


@dataclass(frozen=True)
class BooleanTermWeight:
    """BooleanSimilarity scorer: score(freq, norm) = boost, a constant
    per matching doc (s84 BooleanSimilarity.java BooleanWeight.score)."""

    boost: np.float32

    def score(self, freqs, norm_bytes) -> np.ndarray:
        return np.full(len(np.asarray(freqs)), self.boost, dtype=np.float32)

    def score_scalar(self, freq: float, norm_byte: int) -> float:
        return float(self.boost)

    def max_score(self, imp_freqs, imp_norms) -> float:
        if len(imp_freqs) == 0:
            return 0.0
        return float(self.boost)


class BooleanSimilarity:
    """Query-boost-only similarity (s84 BooleanSimilarity.java:33):
    every match scores exactly the query boost; norms are still written
    with the BM25 encoding (computeNorm delegates to BM25Similarity)."""

    def term_weight(
        self,
        doc_freq: int,
        doc_count: int,
        sum_total_term_freq: int,
        boost: float = 1.0,
        ttf: int | None = None,
    ) -> BooleanTermWeight:
        return BooleanTermWeight(boost=np.float32(boost))


@dataclass(frozen=True)
class DFRTermWeight:
    """DFR(G, B, H2) per-(term, collection) state (s84 DFRSimilarity.java:
    118-121, BasicModelG.java:40-54, AfterEffectB.java:36-40,
    NormalizationH2.java:61, SimilarityBase.java:113-124) — all math in
    DOUBLE, one float32 cast at the end:

      avgfl = sttf / (double) docCount
      tfn   = freq * log2(1 + c * avgfl / docLen)
      F = ttf + 1; lambda = F / (N + F)
      A = log2(lambda + 1); B = log2((1 + lambda) / lambda)
      ae1pTfn = (F + 1) / (df + 1)
      score = boost * (B - (B - A) / (1 + tfn)) * ae1pTfn
    """

    boost: np.float64
    c: np.float64
    avgfl: np.float64
    a: np.float64
    b: np.float64
    ae1p: np.float64

    def score(self, freqs, norm_bytes) -> np.ndarray:
        f = np.asarray(freqs).astype(np.float64, copy=False)
        dl = BYTE4_DECODE_TABLE[np.asarray(norm_bytes, dtype=np.uint8)].astype(
            np.float64
        )
        tfn = f * (np.log(1.0 + self.c * self.avgfl / dl) / np.log(2.0))
        s = self.boost * (self.b - (self.b - self.a) / (1.0 + tfn)) * self.ae1p
        return s.astype(np.float32)

    def score_scalar(self, freq: float, norm_byte: int) -> float:
        return float(self.score(np.array([freq]), np.array([norm_byte]))[0])

    def max_score(self, imp_freqs, imp_norms) -> float:
        if len(imp_freqs) == 0:
            return 0.0
        return float(self.score(imp_freqs, imp_norms).max())


class DFRSimilarity:
    """DFR with the geometric basic model, Bernoulli after-effect and H2
    normalization — DFRSimilarity(BasicModelG, AfterEffectB,
    NormalizationH2(c)). Needs the term's totalTermFreq via ``ttf=``."""

    def __init__(self, c: float = 1.0):
        if not np.isfinite(c) or c <= 0:
            raise ValueError(f"illegal c value: {c}, must be a positive finite value")
        self.c = np.float64(np.float32(c))  # NormalizationH2 stores c as float

    def term_weight(
        self,
        doc_freq: int,
        doc_count: int,
        sum_total_term_freq: int,
        boost: float = 1.0,
        ttf: int | None = None,
    ) -> DFRTermWeight:
        if ttf is None:
            raise ValueError("DFR requires the term's totalTermFreq (ttf=)")
        F = np.float64(ttf) + 1.0
        N = np.float64(doc_count)
        lam = F / (N + F)
        log2 = np.log(2.0)
        return DFRTermWeight(
            boost=np.float64(np.float32(boost)),
            c=self.c,
            avgfl=np.float64(sum_total_term_freq) / np.float64(doc_count),
            a=np.log(lam + 1.0) / log2,
            b=np.log((1.0 + lam) / lam) / log2,
            ae1p=(F + 1.0) / (np.float64(doc_freq) + 1.0),
        )


@dataclass(frozen=True)
class IBTermWeight:
    """IB(LL, DF, H1) per-term state (s84 IBSimilarity.java:107-112,
    DistributionLL.java:37-38, LambdaDF.java:37-42,
    NormalizationH1.java:59) — lambda computed in float32 per LambdaDF
    (nextDown at exactly 1), everything else DOUBLE, one float32 cast:

      lambda = (float)((df + 1) / (N + 1))
      tfn    = (freq * c) * (avgfl / docLen)
      score  = boost * -ln(lambda / (tfn + lambda))
    """

    boost: np.float64
    c: np.float64
    avgfl: np.float64
    lam: np.float64

    def score(self, freqs, norm_bytes) -> np.ndarray:
        f = np.asarray(freqs).astype(np.float64, copy=False)
        dl = BYTE4_DECODE_TABLE[np.asarray(norm_bytes, dtype=np.uint8)].astype(
            np.float64
        )
        tfn = (f * self.c) * (self.avgfl / dl)
        s = self.boost * -np.log(self.lam / (tfn + self.lam))
        return s.astype(np.float32)

    def score_scalar(self, freq: float, norm_byte: int) -> float:
        return float(self.score(np.array([freq]), np.array([norm_byte]))[0])

    def max_score(self, imp_freqs, imp_norms) -> float:
        if len(imp_freqs) == 0:
            return 0.0
        return float(self.score(imp_freqs, imp_norms).max())


class IBSimilarity:
    """Information-based similarity with the log-logistic distribution,
    document-frequency lambda and H1 normalization —
    IBSimilarity(DistributionLL, LambdaDF, NormalizationH1(c))."""

    def __init__(self, c: float = 1.0):
        if not np.isfinite(c) or c <= 0:
            raise ValueError(f"illegal c value: {c}, must be a positive finite value")
        self.c = np.float64(np.float32(c))  # NormalizationH1 stores c as float

    def term_weight(
        self,
        doc_freq: int,
        doc_count: int,
        sum_total_term_freq: int,
        boost: float = 1.0,
        ttf: int | None = None,
    ) -> IBTermWeight:
        lam32 = np.float32((doc_freq + 1.0) / (doc_count + 1.0))
        if lam32 == np.float32(1.0):  # LambdaDF's SPL guard
            lam32 = np.nextafter(lam32, np.float32(0.0))
        return IBTermWeight(
            boost=np.float64(np.float32(boost)),
            c=self.c,
            avgfl=np.float64(sum_total_term_freq) / np.float64(doc_count),
            lam=np.float64(lam32),
        )


_DFI_MEASURES = ("standardized", "saturated", "chisquared")


@dataclass(frozen=True)
class DFITermWeight:
    """DFI per-term state (s84 DFISimilarity.java:score + Independence*
    .java) — all DOUBLE, one float32 cast:

      expected = (ttf + 1) * docLen / (sttf + 1)
      freq <= expected -> 0
      measure: standardized (f-e)/sqrt(e) | saturated (f-e)/e |
               chisquared (f-e)^2/e
      score = boost * log2(measure + 1)
    """

    boost: np.float64
    ttf1: np.float64   # ttf + 1
    sttf1: np.float64  # sumTotalTermFreq + 1
    measure: str

    def score(self, freqs, norm_bytes) -> np.ndarray:
        f = np.asarray(freqs).astype(np.float64, copy=False)
        dl = BYTE4_DECODE_TABLE[np.asarray(norm_bytes, dtype=np.uint8)].astype(
            np.float64
        )
        expected = self.ttf1 * dl / self.sttf1
        d = f - expected
        with np.errstate(divide="ignore", invalid="ignore"):
            if self.measure == "standardized":
                m = d / np.sqrt(expected)
            elif self.measure == "saturated":
                m = d / expected
            else:  # chisquared
                m = d * d / expected
            s = self.boost * (np.log(m + 1.0) / np.log(2.0))
        return np.where(f <= expected, 0.0, s).astype(np.float32)

    def score_scalar(self, freq: float, norm_byte: int) -> float:
        return float(self.score(np.array([freq]), np.array([norm_byte]))[0])

    def max_score(self, imp_freqs, imp_norms) -> float:
        if len(imp_freqs) == 0:
            return 0.0
        return float(self.score(imp_freqs, imp_norms).max())


class DFISimilarity:
    """Divergence-from-independence similarity (DFISimilarity) with one
    of the three shipped independence measures."""

    def __init__(self, measure: str = "standardized"):
        if measure not in _DFI_MEASURES:
            raise ValueError(f"unknown DFI independence measure {measure!r}")
        self.measure = measure

    def term_weight(
        self,
        doc_freq: int,
        doc_count: int,
        sum_total_term_freq: int,
        boost: float = 1.0,
        ttf: int | None = None,
    ) -> DFITermWeight:
        if ttf is None:
            raise ValueError("DFI requires the term's totalTermFreq (ttf=)")
        return DFITermWeight(
            boost=np.float64(np.float32(boost)),
            ttf1=np.float64(ttf) + 1.0,
            sttf1=np.float64(sum_total_term_freq) + 1.0,
            measure=self.measure,
        )


_AXIOMATIC_VARIANTS = ("f1exp", "f1log", "f2exp", "f2log", "f3exp", "f3log")


@dataclass(frozen=True)
class AxiomaticTermWeight:
    """Axiomatic per-(term, collection) state (s84 Axiomatic.java:103-112
    score = tf·ln·tfln·idf − gamma, then ×boost, clamped at 0, one float32
    cast; AxiomaticF{1,2,3}{EXP,LOG}.java component definitions) — all math
    in DOUBLE on the float-stored hyperparameters:

      family f1: tf = 1 + ln(1 + ln(freq + 1)),
                 ln = (avgfl + s) / (avgfl + docLen·s)
      family f2: tfln = freq / (freq + s + s·docLen/avgfl)
      family f3: tf as f1; gamma = (docLen − queryLen)·s·queryLen/avgfl
      idf EXP: ((N + 1) / df)^k     idf LOG: ln((N + 1) / df)

    avgfl = sumTotalTermFreq / docCount (SimilarityBase.fillBasicStats);
    docLen = the byte4-decoded norm length."""

    boost: np.float64
    s: np.float64
    k: np.float64
    query_len: np.float64
    avgfl: np.float64
    idf: np.float64
    variant: str

    def score(self, freqs, norm_bytes) -> np.ndarray:
        f = np.asarray(freqs).astype(np.float64, copy=False)
        dl = BYTE4_DECODE_TABLE[np.asarray(norm_bytes, dtype=np.uint8)].astype(
            np.float64
        )
        fam = self.variant[:2]
        if fam == "f1":
            tf = 1.0 + np.log(1.0 + np.log(f + 1.0))
            ln = (self.avgfl + self.s) / (self.avgfl + dl * self.s)
            core = tf * ln * self.idf
        elif fam == "f2":
            tfln = f / (f + self.s + self.s * dl / self.avgfl)
            core = tfln * self.idf
        else:  # f3
            tf = 1.0 + np.log(1.0 + np.log(f + 1.0))
            gamma = (dl - self.query_len) * self.s * self.query_len / self.avgfl
            core = tf * self.idf - gamma
        return np.maximum(core * self.boost, 0.0).astype(np.float32)

    def score_scalar(self, freq: float, norm_byte: int) -> float:
        return float(self.score(np.array([freq]), np.array([norm_byte]))[0])

    def max_score(self, imp_freqs, imp_norms) -> float:
        if len(imp_freqs) == 0:
            return 0.0
        return float(self.score(imp_freqs, imp_norms).max())


class AxiomaticSimilarity:
    """Axiomatic retrieval models (s84 Axiomatic.java + the six shipped
    subclasses). ``variant`` picks F1/F2/F3 × EXP/LOG; defaults mirror the
    Java constructors (s=0.25, queryLen=1, k=0.35; F3 callers should pass
    their real query length — the Java F3 classes have no default ctor)."""

    def __init__(
        self,
        variant: str = "f2exp",
        s: float = 0.25,
        query_len: int = 1,
        k: float = 0.35,
    ):
        variant = variant.lower()
        if variant not in _AXIOMATIC_VARIANTS:
            raise ValueError(f"unknown Axiomatic variant {variant!r}")
        if not np.isfinite(s) or not (0.0 <= s <= 1.0):
            raise ValueError(f"illegal s value: {s}, must be between 0 and 1")
        if not np.isfinite(k) or not (0.0 <= k <= 1.0):
            raise ValueError(f"illegal k value: {k}, must be between 0 and 1")
        if query_len < 0:
            raise ValueError(f"illegal query length value: {query_len}")
        self.variant = variant
        # Java stores s/k as float fields, widened to double in the math
        self.s = np.float64(np.float32(s))
        self.k = np.float64(np.float32(k))
        self.query_len = np.float64(query_len)

    def term_weight(
        self,
        doc_freq: int,
        doc_count: int,
        sum_total_term_freq: int,
        boost: float = 1.0,
        ttf: int | None = None,
    ) -> AxiomaticTermWeight:
        n1_over_df = (np.float64(doc_count) + 1.0) / np.float64(doc_freq)
        idf = (
            np.power(n1_over_df, self.k)
            if self.variant.endswith("exp")
            else np.log(n1_over_df)
        )
        return AxiomaticTermWeight(
            boost=np.float64(np.float32(boost)),
            s=self.s,
            k=self.k,
            query_len=self.query_len,
            avgfl=np.float64(sum_total_term_freq) / np.float64(doc_count),
            idf=idf,
            variant=self.variant,
        )


def get_similarity(spec: str = "bm25"):
    """Similarity registry — the pluggable-Similarity hook (SURVEY.md
    §2.10; IndexSearcher.setSimilarity role). Specs:

      "bm25"                      -> BM25 defaults (k1=1.2, b=0.75)
      "bm25(k1=1.5, b=0.6)"       -> parameterized BM25
      "bm25legacy"                -> Lucene 7.x BM25 ((k1+1) numerator)
      "bm25legacy(k1=..., b=...)" -> parameterized 7.x BM25
      "classic"                   -> ClassicSimilarity (TFIDF)
      "lmdirichlet"               -> LMDirichlet (mu=2000)
      "lmdirichlet(mu=...)"       -> parameterized LMDirichlet
      "lmjelinekmercer"           -> LM Jelinek-Mercer (lambda=0.1)
      "lmjelinekmercer(lambda=…)" -> parameterized LM Jelinek-Mercer
      "boolean"                   -> BooleanSimilarity (score = boost)
      "dfr"                       -> DFR G/B/H2 (c=1)
      "dfr(c=...)"                -> parameterized DFR G/B/H2
      "ib"                        -> IB LL/DF/H1 (c=1)
      "ib(c=...)"                 -> parameterized IB LL/DF/H1
      "dfi"                       -> DFI standardized
      "dfi(saturated)" etc.       -> DFI with that independence measure
      "axiomaticf2exp" etc.       -> Axiomatic F{1,2,3}{EXP,LOG} defaults
      "axiomaticf3log(s=…, queryLen=…)" -> parameterized Axiomatic
      "sweetspot(min=…, max=…, steepness=…, tf_base=…, tf_min=…)"
                                  -> SweetSpotSimilarity (misc module)

    Searchers accept the returned object via their ``bm25`` argument."""
    import re

    spec = spec.strip()
    max_ = re.fullmatch(r"axiomatic(f[123](?:exp|log))(?:\(([^)]*)\))?", spec)
    if max_ is not None:
        kwargs: dict = {}
        for part in filter(None, (p.strip() for p in (max_.group(2) or "").split(","))):
            key, _, val = part.partition("=")
            key = key.strip()
            if key not in ("s", "k", "queryLen"):
                raise ValueError(f"unknown parameter {key!r} in {spec!r}")
            if key == "queryLen":
                kwargs["query_len"] = int(val)
            else:
                kwargs[key] = float(val)
        return AxiomaticSimilarity(max_.group(1), **kwargs)
    msw = re.fullmatch(r"sweetspot(?:\(([^)]*)\))?", spec)
    if msw is not None:
        kwargs = {}
        names = {"min": "ln_min", "max": "ln_max", "steepness": "steepness",
                 "tf_base": "tf_base", "tf_min": "tf_min"}
        for part in filter(None, (p.strip() for p in (msw.group(1) or "").split(","))):
            key, _, val = part.partition("=")
            key = key.strip()
            if key not in names:
                raise ValueError(f"unknown parameter {key!r} in {spec!r}")
            kwargs[names[key]] = (
                int(val) if key in ("min", "max") else float(val)
            )
        return SweetSpotSimilarity(**kwargs)
    if spec == "bm25":
        return BM25()
    if spec == "bm25legacy":
        return LegacyBM25()
    if spec == "classic":
        return ClassicSimilarity()
    if spec == "lmdirichlet":
        return LMDirichlet()
    if spec == "lmjelinekmercer":
        return LMJelinekMercer()
    if spec == "boolean":
        return BooleanSimilarity()
    if spec == "dfr":
        return DFRSimilarity()
    if spec == "ib":
        return IBSimilarity()
    if spec == "dfi":
        return DFISimilarity()
    mdfi = re.fullmatch(r"dfi\((\w+)\)", spec)
    if mdfi is not None:
        return DFISimilarity(mdfi.group(1))
    m = re.fullmatch(
        r"(bm25legacy|bm25|lmdirichlet|lmjelinekmercer|dfr|ib)\(([^)]*)\)", spec
    )
    if m is None:
        raise ValueError(f"unknown similarity spec {spec!r}")
    cls = {"bm25legacy": LegacyBM25, "bm25": BM25, "lmdirichlet": LMDirichlet,
           "lmjelinekmercer": LMJelinekMercer,
           "dfr": DFRSimilarity, "ib": IBSimilarity}[m.group(1)]
    valid = {"lmdirichlet": ("mu",), "lmjelinekmercer": ("lambda",),
             "dfr": ("c",), "ib": ("c",)}.get(m.group(1), ("k1", "b"))
    kwargs = {}
    for part in filter(None, (p.strip() for p in m.group(2).split(","))):
        key, _, val = part.partition("=")
        key = key.strip()
        if key not in valid:
            raise ValueError(f"unknown parameter {key!r} in {spec!r}")
        # "lambda" is a Python keyword; the ctor argument is "lam"
        kwargs["lam" if key == "lambda" else key] = float(val)
    return cls(**kwargs)
