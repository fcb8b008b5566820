package graft.transport

/** Minimal DNS SRV/TXT resolution for `mongodb+srv://` seed URLs —
  * the MongoDB "Initial DNS Seedlist Discovery" spec (public:
  * github.com/mongodb/specifications, initial-dns-seedlist-discovery;
  * the reference reaches the same behavior through the rust mongodb
  * driver its mongo tasks embed). The seam is a TRAIT so the
  * zero-egress specs inject fixed records; the production default
  * rides the JDK's built-in JNDI DNS provider — no new dependency,
  * no raw resolver code.
  */
object SrvResolver {

  /** One SRV record (RFC 2782 fields, target with the trailing dot
    * stripped).
    */
  final case class Record(priority: Int, weight: Int, port: Int,
      target: String)

  trait Resolver {
    /** SRV records at `name` (e.g. `_mongodb._tcp.cluster0.x.net`).
      * Resolution failures throw — the caller owns the fallback.
      */
    def srv(name: String): Seq[Record]

    /** TXT record strings at `name` (quoted-chunk joining is the
      * provider's job; JNDI returns the joined string).
      */
    def txt(name: String): Seq[String]
  }

  /** JNDI-DNS-backed default (`com.sun.jndi.dns` ships with the
    * JDK; uses the platform's configured nameservers). Failures
    * surface as NamingException for the dial-site fallback.
    */
  object Jndi extends Resolver {
    private def strings(name: String, kind: String): Seq[String] = {
      val env = new java.util.Hashtable[String, String]()
      env.put(javax.naming.Context.INITIAL_CONTEXT_FACTORY,
        "com.sun.jndi.dns.DnsContextFactory")
      env.put(javax.naming.Context.PROVIDER_URL, "dns:")
      val c = new javax.naming.directory.InitialDirContext(env)
      try {
        val attr = c.getAttributes(name, Array(kind)).get(kind)
        if (attr == null) Seq.empty
        else (0 until attr.size).map(i => attr.get(i).toString)
      } finally c.close()
    }
    override def srv(name: String): Seq[Record] =
      strings(name, "SRV").flatMap(parseSrv)
    override def txt(name: String): Seq[String] =
      strings(name, "TXT")
  }

  /** One JNDI SRV attribute value: `priority weight port target[.]`
    * (the DNS provider renders the RDATA space-separated). Garbage
    * records drop rather than poison the whole answer.
    */
  def parseSrv(s: String): Option[Record] =
    s.trim.split("\\s+") match {
      case Array(p, w, pt, t) =>
        for {
          pi <- p.toIntOption
          wi <- w.toIntOption
          pti <- pt.toIntOption
        } yield Record(pi, wi, pti, t.stripSuffix("."))
      case _ => None
    }

  /** The seed-URL host's TXT-sourced option whitelist: the spec
    * allows ONLY these through TXT (anything else must be rejected,
    * not silently merged — a poisoned TXT record must not smuggle,
    * say, `tls=false` into the dial).
    */
  private val TxtAllowed = Set("authSource", "replicaSet",
    "loadBalanced")

  /** Resolve a `mongodb+srv` seed host per the spec: SRV at
    * `_mongodb._tcp.<host>`, host validated to carry ≥3 dns labels,
    * every SRV target validated to sit under the seed's parent
    * domain (first label dropped — a hijacked SRV answer must not
    * redirect the dial outside the cluster's domain), seeds ordered
    * by (priority asc, weight desc), TXT options restricted to the
    * spec's whitelist. Returns (seeds, txt-options); the URL's own
    * query params take precedence over TXT at the merge site.
    * Spec violations throw IllegalArgumentException; DNS failures
    * propagate the provider's exception — both land in the caller's
    * documented direct-dial fallback.
    */
  def mongoSeeds(host: String, resolver: Resolver)
      : (Seq[(String, Int)], Map[String, String]) = {
    val labels = host.split("\\.")
    require(labels.length >= 3,
      s"mongodb+srv host needs >= 3 dns labels: $host")
    val parent = labels.drop(1).mkString(".")
    val records = resolver.srv(s"_mongodb._tcp.$host")
    require(records.nonEmpty, s"no SRV records for $host")
    records.foreach { r =>
      require(r.target == parent || r.target.endsWith("." + parent),
        s"SRV target ${r.target} outside seed domain $parent")
    }
    val seeds = records.sortBy(r => (r.priority, -r.weight))
      .map(r => (r.target, r.port))
    val txts = resolver.txt(host)
    require(txts.size <= 1, s"multiple TXT records for $host")
    val opts = txts.headOption
      .map(_.split("&").toSeq.filter(_.nonEmpty).map {
        _.split("=", 2) match {
          case Array(k, v) => k -> v
          case Array(k) => k -> ""
        }
      }.toMap).getOrElse(Map.empty[String, String])
    val bad = opts.keySet.diff(TxtAllowed)
    require(bad.isEmpty,
      s"TXT options outside the srv spec whitelist: $bad")
    (seeds, opts)
  }
}
