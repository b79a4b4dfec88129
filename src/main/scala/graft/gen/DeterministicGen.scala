package graft.gen

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic, seeded, parallelism-invariant data generators.
  *
  * The reference generates with Faker + the global `random` module
  * (generator.py:9-43): a sequential RNG whose output depends on call
  * order, which cannot be parallelized. The contract its tests actually
  * assert is *determinism under a seed* (tests/test_guardian.py:26-29):
  * same seed ⇒ identical rows. We keep that contract with a strictly
  * stronger property: every column value is a pure function of
  * (seed, row id, column tag) via `xxhash64`, so the same seed yields
  * byte-identical rows at any parallelism, partitioning, or cluster size —
  * the property the 1000-executor deployment needs.
  *
  * All generators return plain DataFrames built from `spark.range(n)` with
  * codegen'd column expressions: no UDFs, no RDDs, no driver-side loops.
  */
object DeterministicGen {

  /** Hash stream: pure function of (seed, tag, key columns). */
  private def h(seed: Long, tag: String, cols: Column*): Column =
    xxhash64((lit(seed) :: lit(tag) :: cols.toList): _*)

  /** Uniform pick from a small literal array (codegen'd, folds at plan
    * time). element_at is 1-based.
    */
  private def pick(values: Seq[String], hash: Column): Column =
    element_at(array(values.map(lit): _*), (pmod(hash, lit(values.size)) + 1).cast("int"))

  /** Uniform 2-decimal value in [lo, hi] (mirrors round(uniform(lo,hi),2),
    * generator.py:20,36): integer cents, so no float rounding ambiguity.
    */
  private def money(lo: Double, hi: Double, hash: Column): Column = {
    val cents = ((hi - lo) * 100).toLong + 1
    (lit(math.round(lo * 100)) + pmod(hash, lit(cents))) / 100.0
  }

  private val firstNames = Seq(
    "James", "Mary", "Robert", "Patricia", "John", "Jennifer", "Michael",
    "Linda", "David", "Elizabeth", "William", "Barbara", "Richard", "Susan",
    "Joseph", "Jessica", "Thomas", "Sarah", "Carlos", "Nancy", "Wei",
    "Yuki", "Amara", "Liam", "Olivia", "Noah", "Emma", "Aiden", "Sofia",
    "Mateo", "Isabella", "Ethan")
  private val lastNames = Seq(
    "Smith", "Johnson", "Williams", "Brown", "Jones", "Garcia", "Miller",
    "Davis", "Rodriguez", "Martinez", "Hernandez", "Lopez", "Gonzalez",
    "Wilson", "Anderson", "Thomas", "Taylor", "Moore", "Jackson", "Martin",
    "Lee", "Perez", "Thompson", "White", "Harris", "Sanchez", "Clark",
    "Ramirez", "Lewis", "Robinson", "Walker", "Young")
  private val cities = Seq(
    "Springfield", "Riverton", "Lakeside", "Fairview", "Georgetown",
    "Ashland", "Milton", "Clinton", "Arlington", "Burlington", "Dayton",
    "Florence", "Greenville", "Kingston", "Madison", "Newport", "Oakland",
    "Princeton", "Salem", "Trenton", "Union", "Vernon", "Winchester",
    "Bristol", "Clayton", "Dover", "Easton", "Franklin", "Glendale",
    "Hudson", "Jackson", "Lancaster")
  private val countryCodes = Seq(
    "US", "GB", "DE", "FR", "JP", "CA", "AU", "BR", "IN", "CN", "MX", "ES",
    "IT", "NL", "SE", "CH", "PL", "KR", "ZA", "AR", "NO", "DK", "FI", "PT",
    "IE", "AT", "BE", "NZ", "SG", "IL", "CZ", "GR")
  private val emailDomains = Seq(
    "example.com", "example.org", "example.net", "mail.test", "inbox.test",
    "post.test", "corp.test", "webmail.test")
  private val companies = Seq(
    "Acme Corp", "Globex", "Initech", "Umbrella LLC", "Stark Industries",
    "Wayne Enterprises", "Wonka Industries", "Tyrell Corp", "Cyberdyne",
    "Soylent Co", "Vandelay Industries", "Hooli", "Pied Piper", "Aperture",
    "Black Mesa", "Oscorp", "Massive Dynamic", "Gringotts", "Monarch",
    "Virtucon", "Duff Co", "Sirius Cybernetics", "MomCorp", "Buy n Large",
    "Weyland Yutani", "Nakatomi Trading", "Zorg Industries", "Octan",
    "Gekko and Co", "Prestige Worldwide", "Paper Street Soap", "Dunder Mifflin")
  private val currencies = Seq("USD", "EUR", "GBP", "JPY")
  private val categories = Seq("food", "travel", "tech", "health", "retail")

  /** Engine restatement of generate_persons (generator.py:9-25): n rows of
    * (id, name, email, age∈[18,90], salary∈[30000,200000] 2dp, city,
    * country).
    */
  def persons(spark: SparkSession, n: Long, seed: Long = 42L): DataFrame = {
    val id = col("id")
    val first = pick(firstNames, h(seed, "first", id))
    val last = pick(lastNames, h(seed, "last", id))
    spark
      .range(n)
      .select(
        id.as("id"),
        concat(first, lit(" "), last).as("name"),
        concat(
          lower(first), lit("."), lower(last), lit(id), lit("@"),
          pick(emailDomains, h(seed, "domain", id))).as("email"),
        (lit(18) + pmod(h(seed, "age", id), lit(73L))).cast("int").as("age"),
        money(30000.0, 200000.0, h(seed, "salary", id)).as("salary"),
        pick(cities, h(seed, "city", id)).as("city"),
        pick(countryCodes, h(seed, "country", id)).as("country"))
  }

  /** Engine restatement of generate_transactions (generator.py:28-43); the
    * reference's ISO-8601 string becomes a real TimestampType.
    */
  def transactions(spark: SparkSession, n: Long, seed: Long = 42L): DataFrame = {
    val id = col("id")
    val baseEpoch = 1704067200L // 2024-01-01T00:00:00Z
    spark
      .range(n)
      .select(
        id.as("id"),
        money(1.0, 10000.0, h(seed, "amount", id)).as("amount"),
        pick(currencies, h(seed, "currency", id)).as("currency"),
        timestamp_seconds(lit(baseEpoch) + pmod(h(seed, "ts", id), lit(365L * 86400L)))
          .as("timestamp"),
        pick(companies, h(seed, "merchant", id)).as("merchant"),
        pick(categories, h(seed, "category", id)).as("category"))
  }

  /** Knobs for the transcript fixture (FIXTURES.md §A.1). Skew: the first
    * `hotConvs` conversations carry `hotTurns` turns each (exercises salted
    * repartitioning, BASELINE.json north_star); the rest carry
    * `turnsPerConv`. `piiPermille` of turns carry planted PII-shaped
    * tokens; `latePermille` of turns are shifted earlier than already-seen
    * event time (late-data tests). Sessions: every `burstLen` turns the
    * conversation pauses for `sessionGapSeconds` (forms distinct session
    * windows when the gap parameter is smaller).
    */
  final case class TranscriptSpec(
      nConvs: Long = 100L,
      turnsPerConv: Long = 20L,
      hotConvs: Long = 0L,
      hotTurns: Long = 0L,
      piiPermille: Int = 0,
      latePermille: Int = 0,
      stepSeconds: Long = 30L,
      burstLen: Long = 8L,
      sessionGapSeconds: Long = 3600L,
      seed: Long = 42L) {
    def totalTurns: Long = hotConvs * hotTurns + (nConvs - hotConvs) * turnsPerConv
  }

  private val phrases = Seq(
    "let me look into that for you",
    "here is the plan we discussed",
    "can you clarify the requirement",
    "running the analysis now",
    "the results look consistent",
    "I will summarize the findings",
    "that matches the earlier data",
    "please confirm the schema",
    "the pipeline completed successfully",
    "let us retry with new parameters",
    "the metrics are within tolerance",
    "I found an anomaly in the batch",
    "checking the upstream source",
    "this needs a follow-up review",
    "the validation report is ready",
    "no issues detected in this window")

  /** The north-rule input table (BASELINE.json input_hint): multi-turn
    * conversation transcripts (conv_id, turn_idx, role, text, tool, ts).
    * Deterministic in (seed, global turn id); per-conversation `ts` is
    * monotone in `turn_idx` except for deliberately planted late rows.
    * turn_idx is 0-based and contiguous within each conversation (the
    * stable-turn-ordering invariant).
    */
  def transcripts(spark: SparkSession, spec: TranscriptSpec): DataFrame = {
    import spec._
    val baseEpoch = 1735689600L // 2025-01-01T00:00:00Z
    val id = col("id")
    val hotTotal = hotConvs * hotTurns
    // Integer division/modulo (Column./ is fractional division); guard the
    // hotTurns=0 case so the unused branch can't divide by zero.
    val safeHot = math.max(hotTurns, 1L)
    val conv = when(id < hotTotal, floor(id / safeHot).cast("long"))
      .otherwise(lit(hotConvs) + floor((id - hotTotal) / turnsPerConv).cast("long"))
    val ti = when(id < hotTotal, pmod(id, lit(safeHot)))
      .otherwise(pmod(id - hotTotal, lit(turnsPerConv)))

    val convId = concat(lit("conv-"), lpad(conv.cast("string"), 6, "0"))
    val hRole = h(seed, "role", conv, ti)
    val role = when(ti === 0, lit("system"))
      .when(pmod(ti, lit(2L)) === 1, lit("user"))
      .when(pmod(hRole, lit(5L)) === 0, lit("tool"))
      .otherwise(lit("assistant"))
    val tool = when(role === "tool", pick(Seq("search", "code", "browse"), h(seed, "tool", conv, ti)))
      .otherwise(lit(""))

    val baseText = concat(
      lit("["), role, lit("] turn "), ti.cast("string"), lit(" of "), convId,
      lit(": "), pick(phrases, h(seed, "phrase", conv, ti)))
    val hPii = h(seed, "pii", conv, ti)
    val ssn = concat(
      lpad(pmod(hPii, lit(900L)) + 100, 3, "0"), lit("-"),
      lpad(pmod(h(seed, "pii2", conv, ti), lit(100L)), 2, "0"), lit("-"),
      lpad(pmod(h(seed, "pii3", conv, ti), lit(10000L)), 4, "0"))
    val piiEmail = concat(
      lower(pick(firstNames, hPii)), lit(id), lit("@leak.test"))
    val text =
      if (piiPermille <= 0) baseText
      else when(pmod(hPii, lit(1000L)) < piiPermille,
        concat(baseText, lit(" reach me at "), piiEmail, lit(" ssn "), ssn))
        .otherwise(baseText)

    // Event time: conversation offset + per-turn step (+ jitter < step) +
    // an extra session gap every burstLen turns; monotone in turn_idx.
    val convOffset = pmod(h(seed, "convoff", conv), lit(86400L))
    val jitter = pmod(h(seed, "jitter", conv, ti), lit(math.max(stepSeconds - 1, 1L)))
    val sessionJump = floor(ti / burstLen).cast("long") * (sessionGapSeconds + stepSeconds)
    val onTimeTs = lit(baseEpoch) + convOffset + ti * stepSeconds + sessionJump + jitter
    val hLate = h(seed, "late", conv, ti)
    val tsSec =
      if (latePermille <= 0) onTimeTs
      else when((pmod(hLate, lit(1000L)) < latePermille) && ti > 0,
        onTimeTs - lit(2L * sessionGapSeconds)).otherwise(onTimeTs)

    spark
      .range(totalTurns)
      .select(
        convId.as("conv_id"),
        ti.cast("int").as("turn_idx"),
        role.as("role"),
        text.as("text"),
        tool.as("tool"),
        timestamp_seconds(tsSec).as("ts"))
  }

  /** Replay duplicates: `dupPermille` of rows are emitted twice (identical
    * bytes — the at-least-once replay a streaming dedup must collapse).
    * Pure per-row explode; no shuffle.
    */
  def withDuplicates(df: DataFrame, dupPermille: Int, seed: Long = 42L): DataFrame = {
    if (dupPermille <= 0) df
    else {
      val hd = h(seed, "dup", col("conv_id"), col("turn_idx"))
      df.withColumn("__copies",
          when(pmod(hd, lit(1000L)) < dupPermille, array(lit(0), lit(1)))
            .otherwise(array(lit(0))))
        .withColumn("__c", explode(col("__copies")))
        .drop("__copies", "__c")
    }
  }

  /** A "generated" twin of a raw transcript stream for provenance-join
    * tests: same (conv_id, turn_idx) keys, same text (the per-turn text
    * equality invariant), slightly perturbed ts (bounded by `maxSkewSeconds`)
    * and a `gen` role marker column.
    */
  def generatedTwin(df: DataFrame, maxSkewSeconds: Long = 60L, seed: Long = 42L): DataFrame = {
    val skew = pmod(h(seed, "twin", col("conv_id"), col("turn_idx")), lit(2 * maxSkewSeconds + 1)) - maxSkewSeconds
    df.withColumn("ts", timestamp_seconds(unix_timestamp(col("ts")) + skew))
  }
}
