package graft

import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Query inventory maps SURVEY.md §2: CEP joins/negation/Kleene (§2.3-2.4) over `events`,
  * windows (§2.5), relational smoke, and the training-data pipeline ops. */
object SparkEntry {

  /** Flagship: the CEP funnel SEQ(view, click, purchase) on sf=0.001. */
  def entry(spark: SparkSession): DataFrame =
    Queries.cepSeq3(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // CEP over events (SURVEY.md §2.3 joins, §2.6 negation, §2.4 Kleene, §2.9 skew)
    "cep_seq2" -> (Queries.cepSeq2 _),
    "cep_sorted_seq2" -> (Queries.cepSortedSeq2 _),
    "cep_seq3" -> (Queries.cepSeq3 _),
    "cep_seq_not" -> (Queries.cepSeqNot _),
    "cep_and2" -> (Queries.cepAnd2 _),
    "cep_kleene" -> (Queries.cepKleene _),
    "cep_kc_cond" -> (Queries.cepKcCond _),
    "cep_salted_seq3" -> (Queries.cepSaltedSeq3 _),
    "cep_auto_seq3" -> (Queries.cepAutoSeq3 _),
    "cep_or" -> (Queries.cepOr _),
    "cep_contig" -> (Queries.cepContig _),
    "cep_single" -> (Queries.cepSingle _),
    "cep_hyper_and2" -> (Queries.cepHyperAnd2 _),
    "cep_merged_vc2" -> (Queries.cepMergedVc2 _),
    "cep_stat_not" -> (Queries.cepStatNot _),
    "cep_nary" -> (Queries.cepNary _),
    "cep_zstream_seq3" -> (Queries.cepZstreamSeq3 _),
    "cep_ii_seq3" -> (Queries.cepIiSeq3 _),
    // relational / window smoke (§2.2, §2.5)
    "q1_agg" -> (Queries.q1Agg _),
    "q_join_nation" -> (Queries.qJoinNation _),
    "q_topk_parts" -> (Queries.qTopkParts _),
    "q_window_day" -> (Queries.qWindowDay _),
    "q_session" -> (Queries.qSession _),
    // training-data pipeline ops
    "dedup_exact" -> (Queries.dedupExact _),
    "d_ngram_pairs" -> (Queries.ngramPairs _),
    "d_minhash_pairs" -> (Queries.minhashPairs _),
    "d_dup_clusters" -> (Queries.dupClusters _),
    "d_simhash_pairs" -> (Queries.simhashPairs _),
    "t_token_count" -> (Queries.tokenCount _),
    "t_quality" -> (Queries.quality _),
    "t_lang_id" -> (Queries.langId _),
    "t_fingerprint" -> (Queries.fingerprint _),
    "s_cosine_top1" -> (Queries.cosineTop1 _),
    "s_cosine_lsh" -> (Queries.cosineLsh _),
    "s_cosine_ivf" -> (Queries.cosineIvf _),
    "d_embed_dup" -> (Queries.embedDup _),
    // multimodal plumbing (binary payload + typed metadata; stubbed decode)
    "m_media_meta" -> (Queries.mediaMeta _),
    "m_media_features" -> (Queries.mediaFeatures _),
    "m_frame_sample" -> (Queries.frameSample _))

  /** Random-hyperplane sketch CTEs shared by the s_cosine_lsh and d_embed_dup oracles:
    * murmur-style (plane, dim) mix in mod-2^64 HUGEINT arithmetic, signed-value /
    * Long.MaxValue plane components, sign-bit buckets per 4-plane table. */
  private val lshSketchCtes: String =
    """WITH e AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS v,
      |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
      |  FROM embeddings),
      |pc AS (
      |  SELECT p, d,
      |    ((11400714819323198485::HUGEINT * p + 14029467366897019727::HUGEINT * d)
      |      % 18446744073709551616)::UBIGINT AS h0
      |  FROM range(0, 16) t(p), range(0, 64) u(d)),
      |pc2 AS (SELECT p, d, xor(h0, h0 >> 33) AS h1 FROM pc),
      |pc3 AS (SELECT p, d,
      |    ((((18397679294719823053::HUGEINT * (h1 >> 32)::HUGEINT) % 4294967296) * 4294967296
      |      + 18397679294719823053::HUGEINT * (h1 & 4294967295)::HUGEINT)
      |      % 18446744073709551616)::UBIGINT AS h2
      |  FROM pc2),
      |pc4 AS (SELECT p, d, xor(h2, h2 >> 33) AS h3 FROM pc3),
      |planes AS (
      |  SELECT p, list(
      |    (CASE WHEN h3 >= 9223372036854775808::UBIGINT
      |          THEN h3::HUGEINT - 18446744073709551616 ELSE h3::HUGEINT END)::DOUBLE
      |      / 9223372036854775807 ORDER BY d) AS pl
      |  FROM pc4 GROUP BY p),
      |proj AS (
      |  SELECT e.vec_id, planes.p, list_dot_product(e.v, planes.pl) AS dp
      |  FROM e, planes),
      |buckets AS (
      |  SELECT vec_id, p // 4 AS t,
      |    sum(CASE WHEN dp >= 0 THEN (1::BIGINT << (p % 4)) ELSE 0 END) AS bucket
      |  FROM proj GROUP BY vec_id, p // 4)""".stripMargin

  /** MinHash pair derivation (32 affine lanes over FNV-1a gram hashes, 8x4 exact-slice
    * banding, exact-Jaccard verify) as a WITH chain ending at `common`/`sz`, shared by
    * the d_minhash_pairs oracle and d_dup_clusters' recursive closure. */
  private val minhashWith: String =
    """WITH w AS (
      |  SELECT doc_id, list_filter(string_split_regex(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), '\s+'),
      |                             x -> len(x) > 0) AS ws
      |  FROM documents),
      |g AS (
      |  SELECT DISTINCT doc_id,
      |    unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] for i in range(1, len(ws) - 1)]) AS gram
      |  FROM w WHERE len(ws) >= 3),
      |h AS (
      |  SELECT doc_id, list_reduce(
      |    list_prepend(14695981039346656037::UBIGINT,
      |      [ord(gram[i])::UBIGINT for i in range(1, len(gram) + 1)]),
      |    (acc, c) -> ((xor(acc, c)::HUGEINT * 1099511628211) % 18446744073709551616)::UBIGINT) AS h
      |  FROM g),
      |lanes AS (
      |  SELECT i AS k,
      |    ((11400714819323198485::HUGEINT * i) % 18446744073709551616)::UBIGINT | 1::UBIGINT AS ak,
      |    ((14029467366897019727::HUGEINT * i) % 18446744073709551616)::UBIGINT | 1::UBIGINT AS bk
      |  FROM range(1, 33) t(i)),
      |mh AS (
      |  SELECT doc_id, k,
      |    min(xor(
      |      (( ((ak::HUGEINT * (h >> 32)::HUGEINT) % 4294967296) * 4294967296
      |        + ak::HUGEINT * (h & 4294967295)::HUGEINT + bk ) % 18446744073709551616)::UBIGINT,
      |      9223372036854775808::UBIGINT)) AS lane
      |  FROM h, lanes GROUP BY doc_id, k),
      |bands AS (
      |  SELECT doc_id, (k - 1) // 4 AS band, list(lane ORDER BY k) AS bkey
      |  FROM mh GROUP BY doc_id, (k - 1) // 4),
      |cands AS (
      |  SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
      |  FROM bands x JOIN bands y ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
      |sz AS (SELECT doc_id, count(*) AS n FROM g GROUP BY 1),
      |common AS (
      |  SELECT c.a_id, c.b_id, count(*) AS n_common
      |  FROM cands c JOIN g ga ON ga.doc_id = c.a_id
      |    JOIN g gb ON gb.doc_id = c.b_id AND ga.gram = gb.gram
      |  GROUP BY 1, 2)""".stripMargin

  private val minhashPairSelect: String =
    """SELECT a_id, b_id FROM common
      |JOIN sz sa ON sa.doc_id = a_id JOIN sz sb ON sb.doc_id = b_id
      |WHERE n_common::DOUBLE / (sa.n + sb.n - n_common) >= 0.4""".stripMargin

  /** DuckDB oracles — one per query. The hash-signature ops (d_minhash, d_simhash)
    * replicate the engine's FNV-1a / affine-lane arithmetic in SQL via HUGEINT
    * mod-2^64 arithmetic; cep_kleene enumerates the size-2/3 click subsets (incl. the
    * reference's aggregate-identity quirk, see graft.cep.Bind.aggId). */
  def oracleSql: Map[String, String] = Map(
    "cep_kleene" ->
      // SEQ(KC(click)[2..3], purchase) WITHIN 2h. Subset members are ordered by feed
      // order (ts, event_id); SEQ bound: last click ts <= purchase ts (ties OK); window
      // inclusive over (first click, purchase). The `k_last + 1 <> b_id` exclusion mirrors
      // the reference's AggregatedEvent identity quirk: an aggregate created by the click
      // with serial i takes identity i+1, so it collides with (and is rejected against)
      // a purchase whose serial is exactly i+1 (/root/reference/base/Event.py:53-57).
      """WITH k AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'),
        |b AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase')
        |SELECT k1.user_id AS user_id,
        |  concat_ws(',', k1.event_id, k2.event_id) AS k_ids, b.event_id AS b_id
        |FROM k k1 JOIN k k2 ON k1.user_id = k2.user_id JOIN b ON k1.user_id = b.user_id
        |WHERE (k1.ts < k2.ts OR (k1.ts = k2.ts AND k1.event_id < k2.event_id))
        |  AND k2.ts <= b.ts AND epoch_us(b.ts) - epoch_us(k1.ts) <= 7200000000
        |  AND k2.event_id + 1 <> b.event_id
        |UNION ALL
        |SELECT k1.user_id,
        |  concat_ws(',', k1.event_id, k2.event_id, k3.event_id), b.event_id
        |FROM k k1 JOIN k k2 ON k1.user_id = k2.user_id JOIN k k3 ON k1.user_id = k3.user_id
        |  JOIN b ON k1.user_id = b.user_id
        |WHERE (k1.ts < k2.ts OR (k1.ts = k2.ts AND k1.event_id < k2.event_id))
        |  AND (k2.ts < k3.ts OR (k2.ts = k3.ts AND k2.event_id < k3.event_id))
        |  AND k3.ts <= b.ts AND epoch_us(b.ts) - epoch_us(k1.ts) <= 7200000000
        |  AND k3.event_id + 1 <> b.event_id""".stripMargin,
    "cep_kc_cond" ->
      // cep_kleene's subset semantics (feed-order members, aggId exclusion, inclusive
      // window) + the KC offset-1 index condition: adjacent closure members ascending in
      // value. Formulated over a MATERIALIZED valid-adjacent-pair CTE self-joined on the
      // shared middle event: a size-3 subset qualifies iff both its adjacent pairs do, and
      // the equality key (x.id2 = y.id1) keeps every join a hash join — the naive triple
      // self-join made DuckDB pick piecewise merge joins on the value inequalities
      // (~300 s at sf0.01 vs 0.03 s for this form).
      """WITH k AS (SELECT user_id, event_id, ts, value FROM events WHERE event_type = 'click'),
        |b AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'),
        |p2 AS MATERIALIZED (
        |  SELECT k1.user_id AS user_id, k1.event_id AS id1, k1.ts AS ts1,
        |         k2.event_id AS id2, k2.ts AS ts2
        |  FROM k k1 JOIN k k2 ON k1.user_id = k2.user_id
        |  WHERE (k1.ts < k2.ts OR (k1.ts = k2.ts AND k1.event_id < k2.event_id))
        |    AND k1.value < k2.value)
        |SELECT p.user_id AS user_id, concat_ws(',', p.id1, p.id2) AS k_ids, b.event_id AS b_id
        |FROM p2 p JOIN b ON p.user_id = b.user_id
        |WHERE p.ts2 <= b.ts AND epoch_us(b.ts) - epoch_us(p.ts1) <= 21600000000
        |  AND p.id2 + 1 <> b.event_id
        |UNION ALL
        |SELECT x.user_id, concat_ws(',', x.id1, x.id2, y.id2), b.event_id
        |FROM p2 x JOIN p2 y ON x.user_id = y.user_id AND x.id2 = y.id1
        |  JOIN b ON x.user_id = b.user_id
        |WHERE y.ts2 <= b.ts AND epoch_us(b.ts) - epoch_us(x.ts1) <= 21600000000
        |  AND y.id2 + 1 <> b.event_id""".stripMargin,
    "m_frame_sample" ->
      """WITH v AS (
        |  SELECT doc_id AS media_id, greatest(1, octet_length(encode(text)) // 256) AS frames,
        |    md5(text) AS sha
        |  FROM documents WHERE doc_id % 3 = 2),
        |f AS (SELECT media_id, sha, unnest(range(0, frames, 4)) AS frame_no FROM v)
        |SELECT media_id, frame_no, sha || ':' || frame_no AS frame_fp FROM f""".stripMargin,
    "m_media_features" ->
      """SELECT doc_id AS media_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |  octet_length(encode(text)) AS n_bytes, md5(text) AS sha,
        |  greatest(1, octet_length(encode(text)) // 256) AS frames
        |FROM documents""".stripMargin,
    "d_simhash_pairs" ->
      // FNV-1a 64-bit per gram (list_reduce with the offset basis prepended as fold init),
      // majority-bit signature, all pairs at hamming <= 3. Quarter-blocking in the Spark
      // plan is a coverage-complete candidate generator, so output = all qualifying pairs.
      """WITH w AS (
        |  SELECT doc_id, list_filter(string_split_regex(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), '\s+'),
        |                             x -> len(x) > 0) AS ws
        |  FROM documents),
        |g AS (
        |  SELECT DISTINCT doc_id,
        |    unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] for i in range(1, len(ws) - 1)]) AS gram
        |  FROM w WHERE len(ws) >= 3),
        |h AS (
        |  SELECT doc_id, list_reduce(
        |    list_prepend(14695981039346656037::UBIGINT,
        |      [ord(gram[i])::UBIGINT for i in range(1, len(gram) + 1)]),
        |    (acc, c) -> ((xor(acc, c)::HUGEINT * 1099511628211) % 18446744073709551616)::UBIGINT) AS h
        |  FROM g),
        |bits AS (
        |  SELECT doc_id, t.b AS b, sum(((h >> t.b) & 1)::BIGINT) AS ones, count(*) AS n
        |  FROM h, range(0, 64) t(b) GROUP BY doc_id, t.b),
        |sig AS (
        |  SELECT doc_id, sum(CASE WHEN 2 * ones > n THEN (1::UBIGINT << b)::HUGEINT ELSE 0 END) AS sig
        |  FROM bits GROUP BY doc_id)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  bit_count(xor(a.sig::UBIGINT, b.sig::UBIGINT))::BIGINT AS hamming
        |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.sig::UBIGINT, b.sig::UBIGINT)) <= 3""".stripMargin,
    "d_minhash_pairs" ->
      // 32 affine minhash lanes over FNV-1a gram hashes (split-multiply keeps the mod-2^64
      // product inside HUGEINT; xor with 2^63 maps the engine's SIGNED min onto unsigned
      // MIN), 8 bands x 4 rows with exact band-slice equality, then exact-Jaccard verify.
      (minhashWith + "\n" + minhashPairSelect),
    // connected components over the SAME verified minhash pairs: cluster id = min doc_id
    // reachable (transitive closure by recursive CTE; the Spark side converges the same
    // min by label propagation)
    "d_dup_clusters" ->
      (minhashWith.replaceFirst("^WITH ", "WITH RECURSIVE ") +
        s",\nmp AS ($minhashPairSelect),\n" +
        """edges AS (SELECT a_id AS x, b_id AS y FROM mp UNION SELECT b_id, a_id FROM mp),
          |reach(x, y) AS (
          |  SELECT x, y FROM edges
          |  UNION
          |  SELECT r.x, e.y FROM reach r JOIN edges e ON r.y = e.x)
          |SELECT x AS doc_id, least(x, min(y)) AS cluster_id FROM reach GROUP BY x""".stripMargin),
    "cep_or" ->
      // SEQ(OR(view,click) x, purchase b) WITHIN 6h: the union of the two alternatives —
      // an event is one type only, so the union is duplicate-free
      """SELECT a.user_id AS user_id, a.event_id AS x_id, b.event_id AS b_id
        |FROM events a JOIN events b ON a.user_id = b.user_id
        |WHERE a.event_type IN ('view', 'click') AND b.event_type = 'purchase'
        |  AND a.ts <= b.ts AND epoch_us(b.ts) - epoch_us(a.ts) <= 21600000000""".stripMargin,
    "cep_contig" ->
      // CONTIGUOUS(v, b): b is the next event after v in per-key arrival order; idx on
      // this table is the raw global event_id (see graft.io.EventsTable scaladoc)
      """SELECT v.user_id AS user_id, v.event_id AS v_id, b.event_id AS b_id
        |FROM events v JOIN events b ON v.user_id = b.user_id
        |WHERE v.event_type = 'view' AND b.event_type = 'purchase'
        |  AND b.event_id = v.event_id + 1
        |  AND v.ts <= b.ts AND epoch_us(b.ts) - epoch_us(v.ts) <= 21600000000""".stripMargin,
    "cep_single" ->
      // MATCH_SINGLE on signup: greedy feed-order consumption = each signup pairs with
      // exactly its FIRST purchase within the window (purchases stay reusable). Feed
      // order is strict ts order per key ((user_id, ts) unique at every SF), so the
      // greedy replay is a rank-1 row_number per signup over its qualifying purchases.
      """SELECT user_id, s_id, b_id FROM (
        |  SELECT s.user_id AS user_id, s.event_id AS s_id, b.event_id AS b_id,
        |         row_number() OVER (PARTITION BY s.event_id ORDER BY b.ts) AS rn
        |  FROM events s JOIN events b ON s.user_id = b.user_id
        |  WHERE s.event_type = 'signup' AND b.event_type = 'purchase'
        |    AND s.ts <= b.ts AND epoch_us(b.ts) - epoch_us(s.ts) <= 259200000000
        |) WHERE rn = 1""".stripMargin,
    "cep_seq2" ->
      """SELECT a.user_id AS user_id, a.event_id AS v_id, b.event_id AS b_id
        |FROM events a JOIN events b ON a.user_id = b.user_id
        |WHERE a.event_type = 'view' AND b.event_type = 'purchase'
        |  AND a.ts <= b.ts AND epoch_us(b.ts) - epoch_us(a.ts) <= 21600000000
        |  AND b.value > a.value""".stripMargin,
    // identical result through the sorted-storage probe path (output-invariance contract)
    "cep_sorted_seq2" ->
      """SELECT a.user_id AS user_id, a.event_id AS v_id, b.event_id AS b_id
        |FROM events a JOIN events b ON a.user_id = b.user_id
        |WHERE a.event_type = 'view' AND b.event_type = 'purchase'
        |  AND a.ts <= b.ts AND epoch_us(b.ts) - epoch_us(a.ts) <= 21600000000
        |  AND b.value > a.value""".stripMargin,
    "cep_seq3" ->
      """SELECT v.user_id AS user_id, v.event_id AS v_id, c.event_id AS c_id, b.event_id AS b_id
        |FROM events v JOIN events c ON v.user_id = c.user_id JOIN events b ON v.user_id = b.user_id
        |WHERE v.event_type = 'view' AND c.event_type = 'click' AND b.event_type = 'purchase'
        |  AND v.ts <= c.ts AND c.ts <= b.ts
        |  AND epoch_us(b.ts) - epoch_us(v.ts) <= 86400000000""".stripMargin,
    "cep_seq_not" ->
      """SELECT s.user_id AS user_id, s.event_id AS s_id, b.event_id AS b_id
        |FROM events s JOIN events b ON s.user_id = b.user_id
        |WHERE s.event_type = 'signup' AND b.event_type = 'purchase'
        |  AND s.ts <= b.ts AND epoch_us(b.ts) - epoch_us(s.ts) <= 259200000000
        |  AND NOT EXISTS (
        |    SELECT 1 FROM events e WHERE e.user_id = s.user_id AND e.event_type = 'error'
        |      AND e.ts >= s.ts
        |      AND (e.ts < b.ts OR (e.ts = b.ts AND e.event_id < b.event_id)))""".stripMargin,
    "cep_and2" ->
      """SELECT e.user_id AS user_id, e.event_id AS e_id, b.event_id AS b_id
        |FROM events e JOIN events b ON e.user_id = b.user_id
        |WHERE e.event_type = 'error' AND b.event_type = 'purchase'
        |  AND abs(epoch_us(e.ts) - epoch_us(b.ts)) <= 3600000000""".stripMargin,
    // local-search MERGED joint evaluation: the 2-step prefix pattern evaluated in one
    // pass with seq3 under MultiPlan plans; the simple join oracles the merged machinery
    "cep_merged_vc2" ->
      """SELECT v.user_id AS user_id, v.event_id AS v_id, c.event_id AS c_id
        |FROM events v JOIN events c ON v.user_id = c.user_id
        |WHERE v.event_type = 'view' AND c.event_type = 'click' AND v.ts <= c.ts
        |  AND epoch_us(c.ts) - epoch_us(v.ts) <= 86400000000""".stripMargin,
    // HyperCube path: same per-user AND semantics (key-equality condition scopes the
    // key-agnostic cube run back to one user) -> shares and2's oracle verbatim
    "cep_hyper_and2" ->
      """SELECT e.user_id AS user_id, e.event_id AS e_id, b.event_id AS b_id
        |FROM events e JOIN events b ON e.user_id = b.user_id
        |WHERE e.event_type = 'error' AND b.event_type = 'purchase'
        |  AND abs(epoch_us(e.ts) - epoch_us(b.ts)) <= 3600000000""".stripMargin,
    // n-ary CSimple condition over three bound names (v.value + c.value < b.value)
    "cep_nary" ->
      """SELECT v.user_id AS user_id, v.event_id AS v_id, c.event_id AS c_id, b.event_id AS b_id
        |FROM events v JOIN events c ON v.user_id = c.user_id JOIN events b ON v.user_id = b.user_id
        |WHERE v.event_type = 'view' AND c.event_type = 'click' AND b.event_type = 'purchase'
        |  AND v.ts <= c.ts AND c.ts <= b.ts
        |  AND epoch_us(b.ts) - epoch_us(v.ts) <= 86400000000
        |  AND v.value + c.value < b.value""".stripMargin,
    // two bounded negatives under a REVERSED (statistic) stack order: the simple
    // double-anti-join oracle proves stack order never changes the match set
    "cep_stat_not" ->
      """SELECT s.user_id AS user_id, s.event_id AS s_id, b.event_id AS b_id
        |FROM events s JOIN events b ON s.user_id = b.user_id
        |WHERE s.event_type = 'signup' AND b.event_type = 'purchase'
        |  AND s.ts <= b.ts AND epoch_us(b.ts) - epoch_us(s.ts) <= 43200000000
        |  AND NOT EXISTS (
        |    SELECT 1 FROM events e WHERE e.user_id = s.user_id AND e.event_type = 'error'
        |      AND e.ts >= s.ts
        |      AND (e.ts < b.ts OR (e.ts = b.ts AND e.event_id < b.event_id)))
        |  AND NOT EXISTS (
        |    SELECT 1 FROM events e WHERE e.user_id = s.user_id AND e.event_type = 'click'
        |      AND e.ts >= s.ts
        |      AND (e.ts < b.ts OR (e.ts = b.ts AND e.event_id < b.event_id)))""".stripMargin,
    // ZStreamOrd bushy plan / iterative-improvement order: both share seq3's result
    // (plans are output-invariant; the driver revalidates on real data)
    "cep_zstream_seq3" ->
      """SELECT v.user_id AS user_id, v.event_id AS v_id, c.event_id AS c_id, b.event_id AS b_id
        |FROM events v JOIN events c ON v.user_id = c.user_id JOIN events b ON v.user_id = b.user_id
        |WHERE v.event_type = 'view' AND c.event_type = 'click' AND b.event_type = 'purchase'
        |  AND v.ts <= c.ts AND c.ts <= b.ts
        |  AND epoch_us(b.ts) - epoch_us(v.ts) <= 86400000000""".stripMargin,
    "cep_ii_seq3" ->
      """SELECT v.user_id AS user_id, v.event_id AS v_id, c.event_id AS c_id, b.event_id AS b_id
        |FROM events v JOIN events c ON v.user_id = c.user_id JOIN events b ON v.user_id = b.user_id
        |WHERE v.event_type = 'view' AND c.event_type = 'click' AND b.event_type = 'purchase'
        |  AND v.ts <= c.ts AND c.ts <= b.ts
        |  AND epoch_us(b.ts) - epoch_us(v.ts) <= 86400000000""".stripMargin,
    "cep_salted_seq3" ->
      """SELECT v.user_id AS user_id, v.event_id AS v_id, c.event_id AS c_id, b.event_id AS b_id
        |FROM events v JOIN events c ON v.user_id = c.user_id JOIN events b ON v.user_id = b.user_id
        |WHERE v.event_type = 'view' AND c.event_type = 'click' AND b.event_type = 'purchase'
        |  AND v.ts <= c.ts AND c.ts <= b.ts
        |  AND epoch_us(b.ts) - epoch_us(v.ts) <= 86400000000""".stripMargin,
    "cep_auto_seq3" ->
      """SELECT v.user_id AS user_id, v.event_id AS v_id, c.event_id AS c_id, b.event_id AS b_id
        |FROM events v JOIN events c ON v.user_id = c.user_id JOIN events b ON v.user_id = b.user_id
        |WHERE v.event_type = 'view' AND c.event_type = 'click' AND b.event_type = 'purchase'
        |  AND v.ts <= c.ts AND c.ts <= b.ts
        |  AND epoch_us(b.ts) - epoch_us(v.ts) <= 86400000000""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  (SUM(CAST(l_quantity AS DECIMAL(18,2)))::DOUBLE) AS sum_qty,
        |  (SUM(CAST(l_extendedprice AS DECIMAL(18,2)))::DOUBLE) AS sum_base,
        |  (SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))::DOUBLE) AS sum_disc,
        |  count(*) AS n
        |FROM lineitem GROUP BY 1, 2""".stripMargin,
    "q_join_nation" ->
      """SELECT n.n_name AS nation,
        |  (SUM(CAST(o.o_totalprice AS DECIMAL(18,2)))::DOUBLE) AS revenue,
        |  count(*) AS n_orders
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY 1""".stripMargin,
    "q_topk_parts" ->
      """SELECT l_partkey,
        |  (SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))::DOUBLE) AS revenue,
        |  count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY revenue DESC, l_partkey LIMIT 5""".stripMargin,
    "q_window_day" ->
      """SELECT event_type, epoch_us(date_trunc('day', ts)) AS day_start,
        |  count(*) AS n_events,
        |  (SUM(CAST(value AS DECIMAL(18,2)))::DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q_session" ->
      """WITH o AS (
        |  SELECT user_id, epoch_us(ts) AS us,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |m AS (SELECT user_id, us,
        |  CASE WHEN prev IS NULL OR us - prev >= 1800000000 THEN 1 ELSE 0 END AS brk FROM o),
        |s AS (SELECT user_id, us,
        |  sum(brk) OVER (PARTITION BY user_id ORDER BY us ROWS UNBOUNDED PRECEDING) AS sid FROM m)
        |SELECT user_id, min(us) AS session_start, count(*) AS n_events
        |FROM s GROUP BY user_id, sid""".stripMargin,
    "dedup_exact" ->
      """SELECT md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp,
        |  min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin,
    "d_ngram_pairs" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), '\s+'),
        |                x -> len(x) > 0) AS ws
        |  FROM documents),
        |g AS (
        |  SELECT DISTINCT doc_id,
        |    unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] for i in range(1, len(ws) - 1)]) AS gram
        |  FROM w WHERE len(ws) >= 3),
        |rare AS (SELECT gram FROM g GROUP BY gram HAVING count(*) <= 50),
        |gc AS (SELECT g.* FROM g JOIN rare USING (gram)),
        |sz AS (SELECT doc_id, count(*) AS n FROM g GROUP BY 1),
        |c AS (
        |  SELECT x.doc_id AS a_id, y.doc_id AS b_id, count(*) AS n_common
        |  FROM gc x JOIN gc y ON x.gram = y.gram AND x.doc_id < y.doc_id GROUP BY 1, 2)
        |SELECT a_id, b_id, n_common, (sa.n + sb.n - n_common) AS n_union
        |FROM c JOIN sz sa ON sa.doc_id = a_id JOIN sz sb ON sb.doc_id = b_id
        |WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= 0.4""".stripMargin,
    "t_token_count" ->
      """SELECT doc_id, len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_tokens,
        |  length(text) AS n_chars FROM documents""".stripMargin,
    "t_quality" ->
      """WITH b AS (
        |  SELECT doc_id, length(text) AS n_chars,
        |    len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_tokens,
        |    (len(regexp_extract_all(lower(text), '\bthe\b')) +
        |     len(regexp_extract_all(lower(text), '\ba\b')) +
        |     len(regexp_extract_all(lower(text), '\bof\b')) +
        |     len(regexp_extract_all(lower(text), '\bto\b')) +
        |     len(regexp_extract_all(lower(text), '\bin\b')) +
        |     len(regexp_extract_all(lower(text), '\band\b')) +
        |     len(regexp_extract_all(lower(text), '\bis\b')) +
        |     len(regexp_extract_all(lower(text), '\bon\b'))) AS n_stopwords
        |  FROM documents)
        |SELECT doc_id, n_tokens, n_stopwords,
        |  (CAST(n_stopwords AS DOUBLE) / CAST(n_tokens AS DOUBLE)) AS stopword_ratio,
        |  (CAST(n_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE)) AS chars_per_token
        |FROM b""".stripMargin,
    "t_lang_id" ->
      """WITH s AS (
        |  SELECT doc_id, lang,
        |    len(regexp_extract_all(lower(text), '\b(der|und|die)\b')) AS sc_de,
        |    len(regexp_extract_all(lower(text), '\b(the|and|a)\b')) AS sc_en,
        |    len(regexp_extract_all(lower(text), '\b(el|la|que)\b')) AS sc_es,
        |    len(regexp_extract_all(lower(text), '\b(le|la|et)\b')) AS sc_fr,
        |    len(regexp_extract_all(lower(text), '\b(de|shi|le)\b')) AS sc_zh
        |  FROM documents)
        |SELECT doc_id,
        |  CASE WHEN sc_zh > greatest(sc_de, sc_en, sc_es, sc_fr) THEN 'zh'
        |       WHEN sc_fr > greatest(sc_de, sc_en, sc_es) THEN 'fr'
        |       WHEN sc_es > greatest(sc_de, sc_en) THEN 'es'
        |       WHEN sc_en > sc_de THEN 'en'
        |       ELSE 'de' END AS pred_lang,
        |  lang AS labeled_lang
        |FROM s""".stripMargin,
    "t_fingerprint" ->
      """SELECT doc_id, md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp
        |FROM documents""".stripMargin,
    "m_media_meta" ->
      """SELECT doc_id AS media_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |  octet_length(encode(text)) AS n_bytes, md5(text) AS sha
        |FROM documents""".stripMargin,
    "s_cosine_lsh" ->
      // Replicates the random-hyperplane sketch exactly: murmur-style mix of (plane, dim)
      // in mod-2^64 arithmetic (HUGEINT split-multiply), signed-value/Long.MaxValue plane
      // components, sign-bit buckets per 4-plane table, candidate pairs sharing any
      // table bucket, cosine top-1. Double math agrees bit-for-bit with the codegen'd
      // dot_product (both accumulate left-to-right in binary64).
      (lshSketchCtes +
      """,
        |cands AS (
        |  SELECT DISTINCT a.vec_id AS vec_id, b.vec_id AS nn_id
        |  FROM buckets a JOIN buckets b ON a.t = b.t AND a.bucket = b.bucket
        |    AND a.vec_id <> b.vec_id),
        |sims AS (
        |  SELECT c.vec_id, c.nn_id,
        |    list_dot_product(ea.v, eb.v) / (ea.norm * eb.norm) AS sim
        |  FROM cands c JOIN e ea ON ea.vec_id = c.vec_id JOIN e eb ON eb.vec_id = c.nn_id),
        |r AS (
        |  SELECT vec_id, nn_id,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, nn_id) AS rk
        |  FROM sims)
        |SELECT vec_id, nn_id FROM r WHERE rk = 1""".stripMargin),
    // embedding-cosine near-dup pairs: same sketch CTEs; unordered (a < b) bucket-join
    // candidates verified against the exact cosine threshold (0.35 = the Spark query's)
    "d_embed_dup" ->
      (lshSketchCtes +
        """,
          |cands AS (
          |  SELECT DISTINCT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b
          |  FROM buckets a JOIN buckets b ON a.t = b.t AND a.bucket = b.bucket
          |    AND a.vec_id < b.vec_id)
          |SELECT c.vec_id_a, c.vec_id_b
          |FROM cands c JOIN e ea ON ea.vec_id = c.vec_id_a JOIN e eb ON eb.vec_id = c.vec_id_b
          |WHERE list_dot_product(ea.v, eb.v) / (ea.norm * eb.norm) >= 0.35""".stripMargin),
    // IVF k-medians ANN replicated bit-for-bit: init = first 8 vectors by vec_id, two
    // assign/median rounds (median spelled as (s[(n+1) div 2] + s[n div 2 + 1]) / 2 over
    // sorted values — the formula both engines compute identically; float SUMS would be
    // accumulation-order-dependent, medians are order-free), distances as |c|^2 - 2<v,c>
    // (common |v|^2 dropped on both sides), probe-2 search, exact-cosine top-1
    "s_cosine_ivf" ->
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
        |  FROM embeddings),
        |c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS k, v AS cl
        |       FROM e ORDER BY vec_id LIMIT 8),
        |d1 AS (SELECT e.vec_id, c.k,
        |         list_dot_product(c.cl, c.cl) - 2 * list_dot_product(e.v, c.cl) AS dist
        |       FROM e CROSS JOIN c0 c),
        |a1 AS (SELECT vec_id, k FROM (
        |         SELECT vec_id, k, row_number() OVER (PARTITION BY vec_id ORDER BY dist, k) AS rk
        |         FROM d1) WHERE rk = 1),
        |s1 AS (SELECT a1.k AS k, t.d AS d, list(e.v[t.d] ORDER BY e.v[t.d]) AS s, count(*) AS n
        |       FROM a1 JOIN e USING (vec_id) CROSS JOIN range(1, 65) t(d) GROUP BY a1.k, t.d),
        |m1 AS (SELECT k, d, (s[(n + 1) // 2] + s[n // 2 + 1]) / 2.0 AS m FROM s1),
        |c1 AS (SELECT c0.k, coalesce(mm.cl, c0.cl) AS cl
        |       FROM c0 LEFT JOIN (SELECT k, list(m ORDER BY d) AS cl FROM m1 GROUP BY k) mm
        |         ON mm.k = c0.k),
        |d2 AS (SELECT e.vec_id, c.k,
        |         list_dot_product(c.cl, c.cl) - 2 * list_dot_product(e.v, c.cl) AS dist
        |       FROM e CROSS JOIN c1 c),
        |a2 AS (SELECT vec_id, k FROM (
        |         SELECT vec_id, k, row_number() OVER (PARTITION BY vec_id ORDER BY dist, k) AS rk
        |         FROM d2) WHERE rk = 1),
        |s2 AS (SELECT a2.k AS k, t.d AS d, list(e.v[t.d] ORDER BY e.v[t.d]) AS s, count(*) AS n
        |       FROM a2 JOIN e USING (vec_id) CROSS JOIN range(1, 65) t(d) GROUP BY a2.k, t.d),
        |m2 AS (SELECT k, d, (s[(n + 1) // 2] + s[n // 2 + 1]) / 2.0 AS m FROM s2),
        |c2 AS (SELECT c1.k, coalesce(mm.cl, c1.cl) AS cl
        |       FROM c1 LEFT JOIN (SELECT k, list(m ORDER BY d) AS cl FROM m2 GROUP BY k) mm
        |         ON mm.k = c1.k),
        |df AS (SELECT e.vec_id, c.k,
        |         list_dot_product(c.cl, c.cl) - 2 * list_dot_product(e.v, c.cl) AS dist
        |       FROM e CROSS JOIN c2 c),
        |rkd AS (SELECT vec_id, k, row_number() OVER (PARTITION BY vec_id ORDER BY dist, k) AS rk
        |        FROM df),
        |af AS (SELECT vec_id, k FROM rkd WHERE rk = 1),
        |pr AS (SELECT vec_id, k FROM rkd WHERE rk <= 2),
        |sims AS (SELECT p.vec_id, b.vec_id AS nn_id,
        |           list_dot_product(ea.v, eb.v) / (ea.norm * eb.norm) AS sim
        |         FROM pr p JOIN af b ON b.k = p.k AND b.vec_id <> p.vec_id
        |           JOIN e ea ON ea.vec_id = p.vec_id JOIN e eb ON eb.vec_id = b.vec_id),
        |r AS (SELECT vec_id, nn_id,
        |        row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, nn_id) AS rk
        |      FROM sims)
        |SELECT vec_id, nn_id FROM r WHERE rk = 1""".stripMargin,
    "s_cosine_top1" ->
      """WITH s AS (
        |  SELECT a.vec_id AS vec_id, b.vec_id AS nn_id,
        |    list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS sim
        |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
        |r AS (SELECT vec_id, nn_id,
        |  row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, nn_id) AS rk FROM s)
        |SELECT vec_id, nn_id FROM r WHERE rk = 1""".stripMargin)
}
