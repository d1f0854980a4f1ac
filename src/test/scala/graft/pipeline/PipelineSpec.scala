package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PipelineSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("exact dedup keeps one row per distinct text") {
    val d = Dedup.exact(docs)
    assert(d.count() == docs.select("text").distinct().count())
    assert(d.agg(sum("n_dups")).head.getLong(0) == docs.count())
  }

  test("ngram jaccard is bounded and excludes self-pairs") {
    val j = Dedup.ngramJaccard(docs, 0.0, col("doc_id") < 30).collect()
    assert(j.nonEmpty)
    assert(j.forall(r => r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0))
    assert(j.forall(r => r.getLong(0) < r.getLong(1)))
  }

  test("minhash candidates are a superset of high-jaccard pairs") {
    // any pair with identical token sets must share every band
    val sim = Dedup.minHashLsh(docs.limit(50).union(docs.limit(50)), 16, 2)
    assert(sim.count() >= 50) // each duplicated doc pairs with its twin
  }

  test("simhash emits one signature per doc; identical texts agree") {
    val s = Dedup.simHash(docs)
    assert(s.count() == docs.count())
    // identical token multisets must produce identical signatures
    val perText = docs.join(s, "doc_id")
      .groupBy(col("text")).agg(countDistinct(col("simhash")).as("n"))
    assert(perText.where(col("n") > 1).count() == 0)
  }

  test("simhash pairs: banding finds all duplicated-doc pairs") {
    val base = docs.limit(30).select(col("doc_id"), col("text"))
    val twins = base.select((col("doc_id") + 10000).as("doc_id"), col("text"))
    val pairs = Dedup.simHashPairs(base.union(twins), 2)
    // every doc and its twin share the text -> identical signature -> a
    // hamming-0 pair the banding must recall
    assert(pairs.where(col("hamming") === 0).count() >= 30)
    assert(pairs.where(col("hamming") > 2).count() == 0)
  }

  test("hammingPairs: capped buckets are counted, narrow bands auto-scale the cap") {
    import spark.implicits._
    // degenerate constant-signature corpus: one bucket per band, all over
    // an explicit cap of 100 -> every bucket dropped, and the drop is
    // OBSERVED in the same job, never silent
    val same = (0L until 150L).map(i => (i, 42L)).toDF("doc_id", "sig")
    val ds = Dedup.newDropStats(spark)
    val pairs = Dedup.hammingPairs(same, "sig", maxHamming = 2,
      maxBucket = 100, drops = Some(ds)).collect()
    assert(pairs.isEmpty)
    assert(ds.buckets.value == 3L) // one over-cap bucket per band
    assert(ds.docs.value >= 3 * 101L) // lower bound: buffer holds cap+1
    // maxHamming=8 -> 7-bit bands (128 values): pre-scaling, ANY 1100-doc
    // bucket silently exceeded the default cap of 1000 and recall
    // collapsed; the width-scaled cap keeps it, so a known hamming-1 pair
    // in a 1100-doc single-bucket band survives with zero drops
    val wide = (0L until 1100L).map(i => (i, i << 8)).toDF("doc_id", "sig")
    val ds2 = Dedup.newDropStats(spark)
    val found = Dedup.hammingPairs(wide, "sig", maxHamming = 8, drops = Some(ds2))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found.contains((0L, 1L))) // sigs 0 and 256: hamming 1
    assert(ds2.buckets.value == 0L)
  }

  test("components: chains collapse transitively, clusters stay separate") {
    import spark.implicits._
    // a 6-node chain (forces merging beyond one star round), a triangle,
    // and an isolated pair
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)).toDF("doc_a", "doc_b")
    val cc = Dedup.components(pairs).as[(Long, Long)].collect().toMap
    assert((1L to 6L).forall(cc(_) == 1L))
    assert((10L to 12L).forall(cc(_) == 10L))
    assert(cc(20L) == 20L && cc(21L) == 20L)
    assert(cc.size == 11)
  }

  test("components: multi-root intermediate states are not mistaken for convergence") {
    import spark.implicits._
    // regression: after one large/small round this graph reaches a state
    // where some node holds out-edges to TWO different roots (e.g.
    // {(2,0),(2,1)}) while no target is a source — a forest check that
    // only looks at target∩source declares convergence there, splitting
    // the single true component and emitting conflicting labels
    val pairs = Seq(
      (2L, 1L), (2L, 3L), (4L, 7L), (6L, 9L), (7L, 4L), (7L, 5L),
      (7L, 9L), (9L, 4L), (10L, 0L), (10L, 3L), (10L, 6L), (10L, 8L)
    ).toDF("doc_a", "doc_b")
    val rows = Dedup.components(pairs).as[(Long, Long)].collect()
    // one row per node, every node labeled with the global min (0)
    assert(rows.length == rows.map(_._1).distinct.length, "duplicate doc labels")
    assert(rows.map(_._1).sorted.toSeq == (0L to 10L),
      s"nodes ${rows.map(_._1).sorted.toSeq}")
    assert(rows.forall(_._2 == 0L), s"labels ${rows.toSeq.sorted}")
  }

  test("components: edge order and direction don't matter; empty is empty") {
    import spark.implicits._
    val fwd = Seq((7L, 3L), (3L, 9L), (9L, 1L)).toDF("doc_a", "doc_b")
    val rev = Seq((1L, 9L), (9L, 3L), (3L, 7L)).toDF("doc_a", "doc_b")
    val a = Dedup.components(fwd).as[(Long, Long)].collect().toSet
    val b = Dedup.components(rev).as[(Long, Long)].collect().toSet
    assert(a == b && a.forall(_._2 == 1L) && a.size == 4)
    assert(Dedup.components(Seq.empty[(Long, Long)].toDF("doc_a", "doc_b"))
      .isEmpty)
  }

  test("keepOne keeps cluster minima plus unclustered docs") {
    import spark.implicits._
    val d = docs.limit(10)
    val ids = d.select(col("doc_id").cast("long")).as[Long].collect().sorted
    val pairs = Seq((ids(0), ids(1)), (ids(1), ids(2)), (ids(5), ids(6)))
      .toDF("doc_a", "doc_b")
    val kept = Dedup.keepOne(d, pairs).select("doc_id").as[Long].collect().toSet
    val expected = ids.toSet -- Set(ids(1), ids(2), ids(6))
    assert(kept == expected)
  }

  test("brute-force topk: self excluded, cosine in [-1,1], k ranks") {
    val t = Similarity.bruteForceTopK(emb, emb.where(col("vec_id") < 5), 3).collect()
    assert(t.length == 15)
    assert(t.forall(r => r.getLong(0) != r.getLong(1)))
    assert(t.forall(r => math.abs(r.getDouble(2)) <= 1.0 + 1e-9))
  }

  test("query-side cap fails loudly instead of broadcasting a corpus") {
    // the query side of every top-k operator is broadcast / candidate-
    // multiplied by construction: passing a corpus-sized frame must throw
    // the bound error up front, not OOM mid-broadcast
    val cap = 3L
    Seq[(String, org.apache.spark.sql.DataFrame => Any)](
      ("bruteForceTopK", q => Similarity.bruteForceTopK(emb, q, 2, maxQueryRows = cap)),
      ("annTopK", q => Similarity.annTopK(emb, q, 2, maxQueryRows = cap)),
      ("ivfTopK", q => Similarity.ivfTopK(emb, q, 2, k = 4, maxQueryRows = cap)),
      ("pqTopK", q => Similarity.pqTopK(emb, q, 2,
        Similarity.fixedCodebooks(4, 4, 16), maxQueryRows = cap))
    ).foreach { case (op, f) =>
      val e = intercept[IllegalArgumentException] { f(emb) } // corpus AS queries
      assert(e.getMessage.contains("maxQueryRows") && e.getMessage.contains(op), op)
      // a bounded query set passes the same gate (plans build lazily;
      // force one to prove the happy path executes)
      f(emb.where(col("vec_id") < cap))
        .asInstanceOf[org.apache.spark.sql.DataFrame].limit(1).collect()
    }
  }

  test("ivf ann: deterministic, self-excluded, decent recall vs brute force") {
    val q = emb.where(col("vec_id") < 10)
    val ivf1 = Similarity.ivfTopK(emb, q, 3, k = 8, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf2 = Similarity.ivfTopK(emb, q, 3, k = 8, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf1 == ivf2) // deterministic quantizer
    assert(ivf1.forall { case (a, b) => a != b })
    val exact = Similarity.bruteForceTopK(emb, q, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = ivf1.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.3, s"recall $recall") // probing 3/8 cells
  }

  test("persisted ivf index: search equals the in-memory probe and prunes to the probed cells") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_idx").toString
    val cents = Similarity.fixedCentroids(8, 64)
    Similarity.ivfBuild(emb, dir, cents)
    val q = emb.where(col("vec_id") < 10)
    val viaIndex = Similarity.ivfSearch(spark, dir, q, 3, nProbe = 3)
    val inMemory = Similarity.ivfProbe(emb, q, 3, cents, nProbe = 3)
    assert(viaIndex.collect().map(_.toSeq).toSet ==
      inMemory.collect().map(_.toSeq).toSet)
    // the scan must carry the literal cell predicate as a PARTITION
    // filter — only probed cell directories are listed/scanned
    val plan = viaIndex.queryExecution.executedPlan.toString
    assert(plan.replaceAll("\\s", "")
      .matches("(?s).*PartitionFilters:\\[[^\\]]*cell.*"),
      s"cell probe not a partition filter:\n${plan.take(1500)}")
    // the on-disk layout is one directory per cell
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cellDirs = f.listStatus(new org.apache.hadoop.fs.Path(s"$dir/cells"))
      .filter(_.isDirectory).map(_.getPath.getName)
      .count(_.startsWith("cell="))
    assert(cellDirs > 1 && cellDirs <= 8)
  }

  test("persisted ivf-pq index: pruned cells, code-only scan, ADC agrees with flat PQ in-cell") {
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_idx").toString
    val cents = Similarity.fixedCentroids(8, 64)
    val cb = Similarity.fixedCodebooks(4, 8, 16)
    Similarity.ivfPqBuild(emb, dir, cents, cb)
    val q = emb.where(col("vec_id") < 10)
    val res = Similarity.ivfPqSearch(spark, dir, q, 3, nProbe = 3)
    val got = res.collect().map(_.toSeq)
    assert(got.nonEmpty && got.toSet ==
      Similarity.ivfPqSearch(spark, dir, q, 3, nProbe = 3).collect().map(_.toSeq).toSet)
    // the probe is a PARTITION filter over the cell directories
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.replaceAll("\\s", "")
      .matches("(?s).*PartitionFilters:\\[[^\\]]*cell.*"),
      s"cell probe not a partition filter:\n${plan.take(1500)}")
    // the cells relation carries CODES only — no embedding column on disk
    val cellsSchema = spark.read.parquet(s"$dir/cells").schema.fieldNames.toSet
    assert(cellsSchema == Set("cell", "cid", "codes"))
    // ADC arithmetic matches flat pqTopK when the probe covers ALL cells
    // (same candidates -> identical tables, distances, ranks)
    val all = Similarity.ivfPqSearch(spark, dir, q, 3, nProbe = 8)
      .collect().map(_.toSeq).toSet
    val flat = Similarity.pqTopK(emb, q, 3, cb).collect().map(_.toSeq).toSet
    assert(all == flat, "nProbe=k IVF-PQ diverged from flat ADC")
  }

  test("diversity sample honors the per-cell quota and is deterministic") {
    val cents = Similarity.fixedCentroids(8, 64)
    val s1 = Similarity.diversitySample(emb, cents, 3).collect()
    val s2 = Similarity.diversitySample(emb, cents, 3).collect()
    assert(s1.map(_.toSeq).toSet == s2.map(_.toSeq).toSet)
    val perCell = s1.groupBy(_.getInt(1)).view.mapValues(_.length)
    assert(perCell.values.forall(_ <= 3))
    assert(s1.map(_.getInt(2)).forall(rn => rn >= 1 && rn <= 3))
  }

  test("incremental diversity sample: any batch split converges to the one-shot sample") {
    val cents = Similarity.fixedCentroids(8, 64)
    val oneShot = Similarity.diversitySample(emb, cents, 4)
      .collect().map(_.toSeq).toSet
    for (splits <- Seq(1, 2, 3)) {
      val dir = java.nio.file.Files.createTempDirectory("div_inc").toString + "/st"
      val last = (0 until splits).map(b => Similarity.diversitySampleIncremental(
        emb.where(col("vec_id") % splits === b), dir, cents, 4)).last
      assert(last.collect().map(_.toSeq).toSet == oneShot,
        s"$splits-batch history diverged from the one-shot sample")
    }
  }

  test("incremental diversity sample: replays converge, superseded states vacuum") {
    val cents = Similarity.fixedCentroids(8, 64)
    val dir = java.nio.file.Files.createTempDirectory("div_replay").toString + "/st"
    val b0 = emb.where(col("vec_id") % 2 === 0)
    val b1 = emb.where(col("vec_id") % 2 === 1)
    Similarity.diversitySampleIncremental(b0, dir, cents, 4, graceMs = 0L)
    val after1 = Similarity.diversitySampleIncremental(b1, dir, cents, 4, graceMs = 0L)
      .collect().map(_.toSeq).toSet
    // replaying batch 1 is a set-union no-op: the state is unchanged
    val replayed = Similarity.diversitySampleIncremental(b1, dir, cents, 4, graceMs = 0L)
      .collect().map(_.toSeq).toSet
    assert(replayed == after1)
    // grace-0 vacuum: only the newest state (+ marker) remains on disk
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val names = f.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName)
    assert(names.count(_.startsWith("state-")) == 1, names.mkString(","))
    assert(names.count(_.startsWith("_state.")) == 1, names.mkString(","))
  }

  test("multi-probe lsh lifts recall over single-probe") {
    val q = emb.where(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(emb, q, 3)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // near-random synthetic embeddings give LSH little natural locality,
    // so compare at bits=3 where 4 probes cover half the bucket space —
    // the assertion is the multi-probe MECHANISM (more of the true top-k
    // recovered, never less), not absolute ANN quality on noise
    def recall(probes: Int): Double = {
      val got = Similarity.annTopK(emb, q, 3, bits = 3, probes = probes)
        .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      got.intersect(exact).size.toDouble / exact.size
    }
    val r1 = recall(1)
    val r4 = recall(4)
    assert(r4 >= r1, s"multi-probe recall $r4 below single-probe $r1")
    assert(r4 > r1 || r4 >= 0.5, s"probing added nothing: $r1 -> $r4")
  }

  test("ann results are a subset of brute-force rankings' candidates") {
    val ann = Similarity.annTopK(emb, emb.where(col("vec_id") < 5), 3, bits = 2)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bf = Similarity.bruteForceTopK(emb, emb.where(col("vec_id") < 5), 500)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ann.subsetOf(bf))
  }

  test("shingle_min kernel equals the per-window md5 minimum; short docs fall back") {
    import spark.implicits._
    val d = Seq((1L, "a b c d e f g"), (2L, "x y z")).toDF("doc_id", "text")
    val out = TextAnalysis.fingerprint(d).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def md5hex(t: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val shingles = "a b c d e f g".split(" ").sliding(5).map(_.mkString(" ")).toSeq
    assert(out(1L) == shingles.map(md5hex).min)
    assert(out(2L) == md5hex("x y z")) // < 5 tokens -> whole-text md5
  }

  test("text analysis: counts positive, langid total, fingerprint deterministic") {
    assert(TextAnalysis.tokenCounts(docs).where(col("n_ws_tokens") <= 0).count() == 0)
    assert(TextAnalysis.langId(docs).count() == docs.count())
    val f1 = TextAnalysis.fingerprint(docs).collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val f2 = TextAnalysis.fingerprint(docs).collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(f1 == f2)
  }

  test("trigram language-ID classifies multilingual fixtures") {
    import spark.implicits._
    // real prose in each profiled language — word-boundary trigrams and
    // morphology ("sch"/"cht", "ión", "ção") must dominate, not a
    // handful of shared function words ("de"/"la" appear in four)
    val fixtures = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and then it runs into the forest with the others", "en"),
      (2L, "der schnelle braune fuchs springt über den faulen hund und läuft schnell durch den dunklen wald nach hause", "de"),
      (3L, "la organización española quiere que los niños estudien la lección de ciencias por la tarde en una casa", "es"),
      (4L, "le renard brun rapide saute par dessus le chien paresseux et il court dans la forêt pour trouver une maison", "fr"),
      (5L, "la volpe marrone salta sopra il cane pigro e corre per la città verso gli alberi della regione con una organizzazione", "it"),
      (6L, "a organização portuguesa quer que as crianças estudem a lição de ciências da tarde em uma casa da cidade", "pt"),
      (11L, "de snelle bruine vos springt over de luie hond en het dier rent dan snel naar een mooi huis in het bos", "nl"),
      (12L, "den snabba bruna räven hoppar över den lata hunden och springer sedan snabbt till ett hus i skogen för att vila", "sv"))
    val docs = fixtures.map { case (id, t, _) => (id, t) }.toDF("doc_id", "text")
    val pred = TextAnalysis.langId(docs)
      .select("doc_id", "lang_pred").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    fixtures.foreach { case (id, text, expected) =>
      assert(pred(id) == expected,
        s"doc $id ('${text.take(30)}…') predicted ${pred(id)}, expected $expected")
    }
    // degenerate inputs must not crash the sequence/substr pipeline
    val weird = Seq((7L, ""), (8L, "!!!"), (9L, "a"), (10L, "日本語のテキスト")).toDF("doc_id", "text")
    assert(TextAnalysis.langId(weird).count() == 4)
  }

  test("langId held-out accuracy: 40 unseen sentences, >= 90% correct") {
    import spark.implicits._
    // five sentences per profiled language, none drawn from the profile
    // corpus — pins model QUALITY, so a future profile edit that silently
    // degrades classification fails here instead of in production
    val held = Seq(
      ("en", Seq(
        "yesterday the children walked to school although the weather was cold and the streets were still wet",
        "she opened the window because the morning light was beautiful and the birds were singing outside",
        "our company will publish the report next week after the board has reviewed every chapter carefully",
        "the old fisherman told us stories about the sea while we waited for the storm to pass",
        "most people think that learning another language takes years of practice and a great deal of patience")),
      ("de", Seq(
        "gestern sind die kinder trotz des kalten wetters zur schule gelaufen und die straßen waren noch nass",
        "sie öffnete das fenster weil das morgenlicht so schön war und die vögel draußen sangen",
        "unsere firma wird den bericht nächste woche veröffentlichen nachdem der vorstand jedes kapitel geprüft hat",
        "der alte fischer erzählte uns geschichten über das meer während wir auf das ende des sturms warteten",
        "die meisten menschen glauben dass das erlernen einer fremden sprache viele jahre übung und geduld braucht")),
      ("es", Seq(
        "ayer los niños caminaron a la escuela aunque el tiempo estaba frío y las calles seguían mojadas",
        "ella abrió la ventana porque la luz de la mañana era hermosa y los pájaros cantaban afuera",
        "nuestra empresa publicará el informe la próxima semana después de que el consejo revise cada capítulo",
        "el viejo pescador nos contó historias sobre el mar mientras esperábamos a que pasara la tormenta",
        "la mayoría de la gente piensa que aprender otro idioma requiere años de práctica y mucha paciencia")),
      ("fr", Seq(
        "hier les enfants sont allés à l'école à pied bien que le temps soit froid et les rues encore mouillées",
        "elle a ouvert la fenêtre parce que la lumière du matin était belle et que les oiseaux chantaient dehors",
        "notre entreprise publiera le rapport la semaine prochaine après que le conseil aura relu chaque chapitre",
        "le vieux pêcheur nous racontait des histoires de la mer pendant que nous attendions la fin de la tempête",
        "la plupart des gens pensent qu'apprendre une autre langue demande des années de pratique et beaucoup de patience")),
      ("it", Seq(
        "ieri i bambini sono andati a scuola a piedi anche se il tempo era freddo e le strade erano ancora bagnate",
        "lei ha aperto la finestra perché la luce del mattino era bellissima e gli uccelli cantavano fuori",
        "la nostra azienda pubblicherà il rapporto la settimana prossima dopo che il consiglio avrà letto ogni capitolo",
        "il vecchio pescatore ci raccontava storie del mare mentre aspettavamo che passasse la tempesta",
        "la maggior parte delle persone pensa che imparare un'altra lingua richieda anni di pratica e molta pazienza")),
      ("pt", Seq(
        "ontem as crianças foram a pé para a escola embora o tempo estivesse frio e as ruas ainda molhadas",
        "ela abriu a janela porque a luz da manhã estava linda e os pássaros cantavam lá fora",
        "a nossa empresa publicará o relatório na próxima semana depois que o conselho rever cada capítulo",
        "o velho pescador contava-nos histórias do mar enquanto esperávamos que a tempestade passasse",
        "a maioria das pessoas acha que aprender outra língua exige anos de prática e muita paciência")),
      ("nl", Seq(
        "gisteren liepen de kinderen naar school hoewel het weer koud was en de straten nog nat waren",
        "zij opende het raam omdat het ochtendlicht zo mooi was en de vogels buiten zongen",
        "ons bedrijf zal het rapport volgende week publiceren nadat het bestuur elk hoofdstuk heeft gelezen",
        "de oude visser vertelde ons verhalen over de zee terwijl wij wachtten tot de storm voorbij was",
        "de meeste mensen denken dat het leren van een andere taal jaren oefening en veel geduld vraagt")),
      ("sv", Seq(
        "igår gick barnen till skolan fastän vädret var kallt och gatorna fortfarande var våta",
        "hon öppnade fönstret eftersom morgonljuset var så vackert och fåglarna sjöng därute",
        "vårt företag kommer att publicera rapporten nästa vecka efter att styrelsen har läst varje kapitel",
        "den gamle fiskaren berättade historier om havet medan vi väntade på att stormen skulle dra förbi",
        "de flesta människor tror att det tar många års övning och mycket tålamod att lära sig ett nytt språk")))
    val rows = held.zipWithIndex.flatMap { case ((lang, ss), li) =>
      ss.zipWithIndex.map { case (s, si) => ((li * 10 + si).toLong, s, lang) }
    }
    val docs = rows.map { case (id, t, _) => (id, t) }.toDF("doc_id", "text")
    val pred = TextAnalysis.langId(docs)
      .select("doc_id", "lang_pred").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val correct = rows.count { case (id, _, lang) => pred(id) == lang }
    val acc = correct.toDouble / rows.size
    assert(acc >= 0.9, {
      val misses = rows.filter { case (id, _, lang) => pred(id) != lang }
        .map { case (id, t, lang) => s"$lang->${pred(id)}: ${t.take(40)}…" }
      s"held-out accuracy $acc below 0.9; misses:\n${misses.mkString("\n")}"
    })
    // every language individually gets a majority of its sentences right
    held.foreach { case (lang, ss) =>
      val ok = rows.count { case (id, _, l) => l == lang && pred(id) == lang }
      assert(ok >= 3, s"$lang: only $ok/5 held-out sentences correct")
    }
  }

  test("png codec: synth -> full decode round-trips pixels through all 5 filters") {
    for (ch <- Seq(1, 2, 3, 4)) {
      val w = 13; val h = 11 // >= 5 rows: every filter type appears
      val fill = (i: Int) => (i * 31 + ch * 7) % 256
      val png = Multimodal.synthPng(w, h, ch, fill)
      val Some((dw, dh, dch, px)) = Multimodal.decodePngPixels(png)
      assert((dw, dh, dch) == (w, h, ch))
      assert(px.zipWithIndex.forall { case (p, i) => (p & 0xff) == fill(i) })
      // header-only parse agrees
      val meta = Multimodal.parsePng(9L, png).get
      assert(meta.format == "png" && meta.width == w &&
        meta.height == h && meta.channels == ch)
    }
  }

  test("png codec cross-validates against the JDK's independent ImageIO codec") {
    // our ENCODER, JDK's decoder: ImageIO must reconstruct our pixels
    val w = 17; val h = 9
    val fill = (i: Int) => (i * 13 + 5) % 256
    val ours = Multimodal.synthPng(w, h, 3, fill)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(ours))
    assert(img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val i = (y * w + x) * 3
      val rgb = img.getRGB(x, y)
      assert(((rgb >> 16) & 0xff) == fill(i) && ((rgb >> 8) & 0xff) == fill(i + 1) &&
        (rgb & 0xff) == fill(i + 2))
    }
    // JDK's ENCODER, our decoder: we must reconstruct ImageIO's pixels
    val src = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val i = (y * w + x) * 3
      src.setRGB(x, y, (fill(i) << 16) | (fill(i + 1) << 8) | fill(i + 2))
    }
    val buf = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(src, "png", buf))
    val Some((dw, dh, dch, px)) = Multimodal.decodePngPixels(buf.toByteArray)
    assert(dw == w && dh == h && dch == 3)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
      val i = (y * w + x) * 3
      assert((px(i + c) & 0xff) == fill(i + c))
    }
  }

  test("png codec: palette (1/2/4/8-bit) and 16-bit depths decode pixel-exact") {
    // palette: packed sub-byte indices expand through PLTE to RGB
    for (depth <- Seq(1, 2, 4, 8)) {
      val w = 13; val h = 6 // w chosen so sub-byte rows have partial bytes
      val n = 1 << depth
      val idx = (i: Int) => (i * 3 + 1) % n
      val png = Multimodal.synthPngPalette(w, h, depth, idx)
      val Some((dw, dh, dch, px)) = Multimodal.decodePngPixels(png)
      assert(dw == w && dh == h && dch == 3, s"depth $depth")
      for (i <- 0 until w * h; c <- 0 until 3)
        assert((px(i * 3 + c) & 0xff) == ((idx(i) * 3 + c) * 11 + 3) % 256,
          s"palette depth $depth pixel $i ch $c")
      // cross-check: ImageIO decodes the same paletted stream identically
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      for (y <- 0 until h; x <- 0 until w) {
        val i = y * w + x
        val rgb = img.getRGB(x, y)
        assert(((rgb >> 16) & 0xff) == (px(i * 3) & 0xff) &&
          ((rgb >> 8) & 0xff) == (px(i * 3 + 1) & 0xff) &&
          (rgb & 0xff) == (px(i * 3 + 2) & 0xff), s"ImageIO diverges at depth $depth")
      }
    }
    // 16-bit: all five filters at bpp = 2*ch, samples reduce to high byte
    for (ch <- Seq(1, 3)) {
      val w = 9; val h = 7
      val sample = (s: Int) => (s * 2654 + 77) % 65536
      val png = Multimodal.synthPng16(w, h, ch, sample)
      val Some((dw, dh, dch, px)) = Multimodal.decodePngPixels(png)
      assert(dw == w && dh == h && dch == ch)
      for (s <- 0 until w * h * ch)
        assert((px(s) & 0xff) == sample(s) / 256, s"16-bit ch=$ch sample $s")
      // cross-check: ImageIO's 16-bit raster, scaled to 8-bit, agrees
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      val raster = img.getRaster
      for (y <- 0 until h; x <- 0 until w; c <- 0 until ch)
        assert(raster.getSample(x, y, c) >> 8 == (px((y * w + x) * ch + c) & 0xff),
          s"ImageIO diverges at 16-bit ch=$ch")
    }
    // malformed palette stream: index past PLTE -> clean None, not a crash
    assert(Multimodal.decodePngPixels(
      Multimodal.synthPng(3, 3, 3, _ => 0).patch(25, Array(3.toByte), 1)).isEmpty)
  }

  test("png codec: Adam7 interlaced streams decode identical to non-interlaced") {
    // sizes that produce full, partial, and EMPTY interlace passes
    for ((w, h) <- Seq((1, 1), (3, 2), (8, 8), (17, 9), (31, 23)); ch <- Seq(1, 3, 4)) {
      val fill = (i: Int) => (i * 7 + w * ch) % 256
      val straight = Multimodal.decodePngPixels(Multimodal.synthPng(w, h, ch, fill)).get
      val inter = Multimodal.decodePngPixels(Multimodal.synthPngAdam7(w, h, ch, fill)).get
      assert(inter._1 == w && inter._2 == h && inter._3 == ch, s"$w x $h ch=$ch")
      assert(inter._4.sameElements(straight._4), s"$w x $h ch=$ch pixels diverge")
      // ImageIO (independent codec) decodes our interlaced stream identically
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
        Multimodal.synthPngAdam7(w, h, ch, fill)))
      assert(img != null && img.getWidth == w && img.getHeight == h, s"$w x $h ch=$ch")
      if (ch >= 3) {
        for (y <- 0 until h; x <- 0 until w) {
          val o = (y * w + x) * ch
          val rgb = img.getRGB(x, y)
          assert(((rgb >> 16) & 0xff) == (inter._4(o) & 0xff) &&
            ((rgb >> 8) & 0xff) == (inter._4(o + 1) & 0xff) &&
            (rgb & 0xff) == (inter._4(o + 2) & 0xff), s"ImageIO diverges $w x $h ch=$ch ($x,$y)")
          if (ch == 4)
            assert(((rgb >> 24) & 0xff) == (inter._4(o + 3) & 0xff), s"alpha $w x $h ($x,$y)")
        }
      } else {
        for (y <- 0 until h; x <- 0 until w)
          assert(img.getRaster.getSample(x, y, 0) == (inter._4(y * w + x) & 0xff),
            s"ImageIO diverges gray $w x $h ($x,$y)")
      }
    }
    // foreign interlaced stream: ImageIO's ENCODER in Adam7 mode, our decoder
    val w = 21; val h = 13
    val src = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      src.setRGB(x, y, ((x * 11 + 3) << 16) | ((y * 17 + 5) << 8) | ((x + y) * 7 % 256))
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT) // Adam7
    val buf = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(buf)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(src, null, null), param)
    ios.close(); writer.dispose()
    val bytes = buf.toByteArray
    assert((bytes(28) & 0xff) == 1, "ImageIO did not write an interlaced stream")
    val Some((dw, dh, dch, px)) = Multimodal.decodePngPixels(bytes)
    assert(dw == w && dh == h && dch == 3)
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = src.getRGB(x, y)
      val o = (y * w + x) * 3
      assert((px(o) & 0xff) == ((rgb >> 16) & 0xff) &&
        (px(o + 1) & 0xff) == ((rgb >> 8) & 0xff) &&
        (px(o + 2) & 0xff) == (rgb & 0xff), s"foreign interlaced ($x,$y)")
    }
  }

  test("resize: identity at same dims, correct source mapping on downscale") {
    val w = 6; val h = 4; val ch = 3
    val px = Array.tabulate(w * h * ch)(i => (i % 251).toByte)
    assert(Multimodal.resizeNearest(px, w, h, ch, w, h).sameElements(px))
    val half = Multimodal.resizeNearest(px, w, h, ch, 3, 2)
    for (y <- 0 until 2; x <- 0 until 3; c <- 0 until ch) {
      val src = ((y * h / 2) * w + (x * w / 3)) * ch + c
      assert((half((y * 3 + x) * ch + c) & 0xff) == (px(src) & 0xff))
    }
    // upscale replicates pixels (2x2 from 1x1)
    val one = Array[Byte](10, 20, 30)
    val up = Multimodal.resizeNearest(one, 1, 1, 3, 2, 2)
    assert(up.grouped(3).forall(_.sameElements(one)))
  }

  test("wav audio stats decode real PCM: silence is zero, known ramp matches") {
    // hand-build a WAV whose samples are known: synthWav's payload byte j
    // is j % 251
    val wav = Multimodal.synthWav(1, 8000, 16, 4)
    val Some((frames, n, meanAbs, rms)) = Multimodal.wavAudioStats(7L, wav)
    assert(frames == 4 && n == 4)
    val samples = (0 until 4).map { k =>
      val s = (2 * k) % 251 + 256 * ((2 * k + 1) % 251)
      if (s >= 32768) s - 65536 else s
    }
    assert(meanAbs == samples.map(math.abs(_).toDouble).sum / 4)
    assert(rms == math.sqrt(samples.map(s => s.toDouble * s).sum / 4))
    // non-wav bytes -> None
    assert(Multimodal.wavAudioStats(1L, Array[Byte](1, 2, 3)).isEmpty)
    // a data chunk whose DECLARED size runs past the blob (truncated
    // upload): stats come from the readable prefix, no executor
    // ArrayIndexOutOfBoundsException
    // 52-byte blob, data at offset 44: a claimed 48-byte data chunk passes
    // parseWav's sz<=length check but runs 40 bytes past the end
    val lying = Multimodal.synthWav(1, 8000, 16, 4)
    lying(40) = 0x30; lying(41) = 0x00 // data size claims 48 bytes
    val Some((_, nClamped, _, _)) = Multimodal.wavAudioStats(8L, lying)
    assert(nClamped == 4) // the 8 real payload bytes = 4 samples
  }

  test("jpeg header parser reads dims from a real ImageIO-encoded jpeg") {
    val w = 21; val h = 14
    val src = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val buf = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(src, "jpg", buf))
    val meta = Multimodal.parseJpeg(3L, buf.toByteArray).get
    assert(meta.format == "jpeg" && meta.width == w &&
      meta.height == h && meta.channels == 3)
    // sniff order: decodeOne routes jpeg bytes to the jpeg parser
    assert(Multimodal.decodeOne(
      Multimodal.MediaBlob(3L, buf.toByteArray)).format == "jpeg")
    // truncated / non-jpeg inputs fall through cleanly
    assert(Multimodal.parseJpeg(1L, buf.toByteArray.take(3)).isEmpty)
    assert(Multimodal.parseJpeg(1L, Array[Byte](0, 1, 2, 3)).isEmpty)
  }

  test("wav/bmp header parsers round-trip the synthesizers") {
    val w = Multimodal.parseWav(1, Multimodal.synthWav(2, 16000, 16, 37)).get
    assert(w.format == "wav" && w.width == 37 && w.height == 16000 && w.channels == 2)
    assert(w.n_bytes == 44 + 37 * 2 * 2)
    val b = Multimodal.parseBmp(2, Multimodal.synthBmp(13, 7)).get
    assert(b.format == "bmp" && b.width == 13 && b.height == 7 && b.channels == 3)
    assert(b.n_bytes == 54 + ((3 * 13 + 3) / 4) * 4 * 7)
    // unknown container bytes fall through to the stub
    assert(Multimodal.decodeOne(Multimodal.MediaBlob(3, "hello".getBytes)).format == "raw")
    // malformed RIFF with a negative chunk size must not hang the parser
    val evil = Multimodal.synthWav(1, 8000, 16, 4)
    evil(16) = 0xFF.toByte; evil(17) = 0xFF.toByte
    evil(18) = 0xFF.toByte; evil(19) = 0xFF.toByte // fmt size -> -1
    assert(Multimodal.decodeOne(Multimodal.MediaBlob(4, evil)).format == "raw")
  }

  test("multimodal stub: metadata matches payload size") {
    val m = Multimodal.decodeMeta(spark, docs).collect()
    assert(m.length == docs.count())
    assert(m.forall(x => x.width == (x.n_bytes % 256) + 1 && x.channels == 3))
    val fr = Multimodal.sampleFrames(spark, docs, everyK = 64)
    assert(fr.count() > 0)
  }

  test("pq: codes bounded and deterministic; a duplicate vector ranks first") {
    import spark.implicits._
    val cb = Similarity.fixedCodebooks(4, 8, 16)
    val rnd = new scala.util.Random(7)
    def vec(): Seq[Float] = Seq.fill(64)(rnd.nextFloat() * 2 - 1)
    val base = (0L until 30L).map(id => (id, vec()))
    // vec 100 duplicates vec 0: ADC must rank it as vec 0's nearest —
    // identical codes minimize every LUT probe term
    val corpus = (base :+ (100L, base.head._2)).toDF("vec_id", "embedding")
    val codes = Similarity.pqEncode(corpus, cb).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes.values.forall(c => c.length == 4 && c.forall(x => x >= 0 && x < 8)))
    assert(codes(0L) == codes(100L), "identical vectors get identical codes")
    val again = Similarity.pqEncode(corpus, cb).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes == again, "encoding is deterministic")
    val top = Similarity.pqTopK(corpus, corpus.where(col("vec_id") === 0L), 3, cb)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(top.map(_._4).toSeq == (1 to 3))
    assert(top.head._2 == 100L, "the duplicate vector is the nearest candidate")
    assert(top.forall(_._2 != 0L), "self is excluded")
  }

  test("bm25: ranks term-dense short docs first, ignores non-matching docs") {
    import spark.implicits._
    val corpus = Seq(
      (0L, "spark spark spark"),              // tf=3, short -> top for 'spark'
      (1L, "spark is a framework and spark is fast and more words here"),
      (2L, "nothing relevant at all whatsoever"),
      (3L, "framework"),                      // rarer term: higher idf
      (4L, "words words words words words words")).toDF("doc_id", "text")
    val r = TextAnalysis.bm25(corpus, Seq("spark", "framework"), topN = 10)
      .collect().map(x => (x.getLong(0), x.getDouble(1), x.getInt(2)))
    // only docs containing >= 1 query term appear, ranks are 1..n
    assert(r.map(_._1).toSet == Set(0L, 1L, 3L))
    assert(r.map(_._3).toSeq == (1 to 3))
    // scores strictly positive and ordered with the rank
    assert(r.forall(_._2 > 0))
    assert(r.sortBy(_._3).map(_._2).reverse.sorted.sameElements(
      r.sortBy(_._3).map(_._2).reverse))
    val byDoc = r.map(x => x._1 -> x._2).toMap
    assert(byDoc(0L) > byDoc(1L), "term-dense short doc outranks long doc")
    assert(byDoc(1L) > byDoc(3L), "matching both terms beats one short match")
  }
  test("exactStream drops within-watermark duplicates, keeps distinct docs") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Long, String)] // (doc_id, t_ms, text)
    val q = Dedup.exactStream(
        in.toDF().toDF("doc_id", "t", "text")
          .withColumn("ts2", timestamp_millis(col("t"))),
        "ts2", lateness = "1 hour")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    def ids() = spark.table("dedup_stream")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    try {
      // batch 1: two distinct texts + an in-batch duplicate
      in.addData((1L, 1000L, "alpha beta"), (2L, 2000L, "gamma"),
        (3L, 3000L, "alpha beta"))
      q.processAllAvailable()
      val first = ids()
      assert(first.contains(2L) && (first & Set(1L, 3L)).size == 1)
      // batch 2: a cross-batch duplicate inside the watermark is dropped,
      // a new text passes
      in.addData((4L, 4000L, "gamma"), (5L, 5000L, "delta"))
      q.processAllAvailable()
      assert(ids() == first + 5L)
    } finally q.stop()
  }

  test("autoCellCount: k tracks sqrt(n), clamped to the floor and ceiling") {
    assert(Similarity.autoCellCount(0) == 16)          // floor
    assert(Similarity.autoCellCount(100) == 16)        // sqrt(100)=10 < floor
    assert(Similarity.autoCellCount(100000) == 316)    // sqrt
    assert(Similarity.autoCellCount(1000000000L) == 31623)
    assert(Similarity.autoCellCount(Long.MaxValue) == (1 << 18)) // ceiling
    // the n^1.5 bound the heuristic exists for: total per-cell pair work
    // n^2/k at k=sqrt(n) is n^1.5
    val n = 1000000L
    val k = Similarity.autoCellCount(n)
    assert(n.toDouble * n / k <= 1.05 * math.pow(n.toDouble, 1.5))
  }

  test("recallAtK: probing ALL cells recovers brute force exactly; fewer probes bound it") {
    val e = emb
    val q = e.where(col("vec_id") < 10)
    val cents = Similarity.fixedCentroids(8, 64)
    val exact = Similarity.bruteForceTopK(e, q, 3)
    // closure: nProbe = k means every candidate is scored -> recall 1.0
    val full = Similarity.recallAtK(
      Similarity.ivfProbe(e, q, 3, cents, nProbe = 8), exact).collect()
    assert(full.length == 10)
    assert(full.forall(r => r.getAs[Double]("recall") == 1.0),
      "probing all cells must equal brute force")
    // bounded: every recall in [0,1], k taken from the exact side
    val part = Similarity.recallAtK(
      Similarity.ivfProbe(e, q, 3, cents, nProbe = 1), exact).collect()
    assert(part.forall { r =>
      val rec = r.getAs[Double]("recall")
      rec >= 0.0 && rec <= 1.0 && r.getAs[Long]("k") == 3L &&
        r.getAs[Long]("hits") <= 3L
    })
    // monotone in nProbe on average (more cells scored, never fewer hits
    // for the same ranking rule)
    def mean(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(_.getAs[Double]("recall")).sum / rows.length
    assert(mean(full) >= mean(part))
  }

  test("imi: all-pair probing equals brute force; cells match a driver-side replay") {
    val cb = Similarity.fixedCodebooks(2, 4, 32)
    val q = emb.where(col("vec_id") < 10)
    // closure: probing all 16 (u, v) pairs scores every candidate — the
    // two-level probe then IS brute force (same ranking tail)
    assert(Similarity.imiProbe(emb, q, 3, cb, nProbe = 16)
      .collect().map(_.toSeq).toSet ==
      Similarity.bruteForceTopK(emb, q, 3).collect().map(_.toSeq).toSet)
    // the two-level cell is exactly (first-half argmin)·K + second-half
    // argmin — pinned against a driver-side replay of the kernel's fold
    val got = emb.where(col("vec_id") < 100)
      .select(col("vec_id"),
        Similarity.imiCell(col("embedding").cast("array<double>"), cb).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val raw = emb.where(col("vec_id") < 100)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def argmin(x: Array[Double], off: Int, half: Array[Array[Double]]): Int = {
      var best = -1; var bd = Double.PositiveInfinity
      for (j <- half.indices) {
        var d = 0.0
        var t = 0
        while (t < half(j).length) { val v = x(off + t) - half(j)(t); d += v * v; t += 1 }
        if (d < bd) { bd = d; best = j }
      }
      best
    }
    raw.foreach { case (id, x) =>
      assert(got(id) == argmin(x, 0, cb(0)) * 4 + argmin(x, 32, cb(1)),
        s"two-level cell diverged for vec $id")
    }
    // a partial probe stays a well-formed approximation
    val rec = Similarity.recallAtK(
      Similarity.imiProbe(emb, q, 3, cb, nProbe = 3),
      Similarity.bruteForceTopK(emb, q, 3)).collect()
    assert(rec.length == 10 && rec.forall { r =>
      val x = r.getAs[Double]("recall"); x >= 0.0 && x <= 1.0
    })
  }

  test("offset kernels fail loud on short embeddings, never read garbage") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val short = new GenericArrayData(Array(1.0, 2.0))
    // flat path: 2 elements, kernel wants dims=4 from offset 0
    intercept[IllegalArgumentException] {
      NearestCells.nearest(new Array[Double](4), 4, short, 1, 0)
    }
    // offset path: 2 elements, kernel wants [1, 3) then [1, 3) of a LUT
    intercept[IllegalArgumentException] {
      SubDists.dists(new Array[Double](2), 2, 1, short)
    }
    // well-formed input at an offset still works (reads the tail slice)
    assert(SubDists.dists(Array(2.0), 1, 1, short).toDoubleArray()
      .sameElements(Array(0.0)))
  }

  test("quantizer metadata reads fail loud on a footer-less directory") {
    val dir = java.nio.file.Files.createTempDirectory("qf_empty")
    try {
      val e = intercept[IllegalStateException] {
        QuantizerFiles.readIntVec(spark, dir.toString)
      }
      assert(e.getMessage.contains("no parquet files"))
    } finally java.nio.file.Files.deleteIfExists(dir)
  }
}
