package graft.layout

import scala.jdk.CollectionConverters._

import org.yaml.snakeyaml.Yaml

/** Dataset discovery: dataset.yaml layouts and catalog files (SURVEY.md
  * §1.1, S16, P10-P12, J6; reference docs/specs/dataset_yaml_v1.md:5-82,
  * docs/specs/catalog.md:5-60, downloader/Catalog.java:215-353).
  *
  * Driver-side metadata only (a catalog is a handful of entries — the data
  * path goes through the xvec/parquet sources).
  */
object Catalog {

  final case class FacetSource(path: String, window: FWindow, kind: String)

  final case class Profile(name: String, facets: Map[String, FacetSource])

  final case class DatasetEntry(
      name: String,
      url: String,
      attributes: Map[String, String],
      profiles: Map[String, Profile])

  /** Facet aliases per ViewKind.java:34. */
  val facetAliases: Map[String, String] = Map(
    "base" -> "base_vectors", "query" -> "query_vectors",
    "indices" -> "neighbor_indices", "distances" -> "neighbor_distances",
    "base_vectors" -> "base_vectors", "query_vectors" -> "query_vectors",
    "neighbor_indices" -> "neighbor_indices", "neighbor_distances" -> "neighbor_distances",
    "base_content" -> "base_content", "query_terms" -> "query_terms",
    "query_filters" -> "query_filters")

  private def asMap(o: Any): Map[String, Any] = o match {
    case m: java.util.Map[_, _] => m.asScala.map { case (k, v) => k.toString -> v }.toMap
    case null => Map.empty
    case other => throw new IllegalArgumentException(s"expected map, got: $other")
  }

  /** Parse a dataset.yaml: attributes + profiles (facet → source/window),
    * with profile inheritance from `default` (dataset_yaml_v1.md:80-82).
    */
  def parseDatasetYaml(name: String, yamlText: String): DatasetEntry = {
    val root = asMap(new Yaml().load[Any](yamlText))
    val attributes = asMap(root.getOrElse("attributes", null)).map { case (k, v) => k -> String.valueOf(v) }
    val profilesRaw = asMap(root.getOrElse("profiles", null))

    def parseFacet(v: Any): FacetSource = v match {
      case s: String => FacetSource(s, FWindow.ALL, "auto")
      case m: java.util.Map[_, _] =>
        val mm = asMap(m)
        FacetSource(
          String.valueOf(mm.getOrElse("source", mm.getOrElse("file", ""))),
          mm.get("window").map(w => FWindow.parse(String.valueOf(w))).getOrElse(FWindow.ALL),
          String.valueOf(mm.getOrElse("kind", "auto")))
      case other => throw new IllegalArgumentException(s"bad facet spec: $other")
    }

    def parseProfile(pname: String, v: Any): Profile =
      Profile(pname, asMap(v).flatMap { case (facet, fv) =>
        facetAliases.get(facet).map(canon => canon -> parseFacet(fv))
      })

    // `sized:` expansion (DSSizedExpander.java:84-196): each expanded count
    // becomes a profile over the default facets windowed to [0..count)
    val (sizedRaw, normalRaw) = profilesRaw.partition(_._1 == "sized")
    val parsed = normalRaw.map { case (p, v) => p -> parseProfile(p, v) }
    // inheritance: every profile starts from default's facets
    val default = parsed.get("default").map(_.facets).getOrElse(Map.empty)
    val withInheritance = parsed.map { case (p, prof) =>
      p -> prof.copy(facets = default ++ prof.facets)
    }
    val sizedProfiles = sizedRaw.headOption.map(_._2).toSeq.flatMap { sizedData =>
      val specs: Seq[String] = sizedData match {
        case l: java.util.List[_] => l.asScala.toSeq.map(String.valueOf)
        case m: java.util.Map[_, _] => asMap(m).get("ranges") match {
          case Some(rl: java.util.List[_]) => rl.asScala.toSeq.map(String.valueOf)
          case Some(s: String)             => Seq(s)
          case other => throw new IllegalArgumentException(s"sized.ranges missing: $other")
        }
        case other => throw new IllegalArgumentException(s"bad sized spec: $other")
      }
      SizedExpander.expand(specs).map { e =>
        val windowed = default.map { case (facetName, fs) =>
          facetName -> fs.copy(window = FWindow(Seq(FInterval(0, e.count))))
        }
        e.name -> Profile(e.name, windowed)
      }
    }
    DatasetEntry(name, "", attributes, withInheritance ++ sizedProfiles)
  }

  /** Parse a catalog.yaml/json: list of entries with name/url/attributes. */
  def parseCatalog(yamlText: String): Seq[DatasetEntry] = {
    new Yaml().load[Any](yamlText) match {
      case l: java.util.List[_] =>
        l.asScala.toSeq.map { e =>
          val m = asMap(e)
          DatasetEntry(
            String.valueOf(m.getOrElse("name", "")),
            String.valueOf(m.getOrElse("url", "")),
            asMap(m.getOrElse("attributes", null)).map { case (k, v) => k -> String.valueOf(v) },
            Map.empty)
        }
      case other => throw new IllegalArgumentException(s"catalog must be a list, got: $other")
    }
  }

  // ---- P10 lookup/match ----

  def findExact(entries: Seq[DatasetEntry], name: String): Option[DatasetEntry] =
    entries.find(_.name == name)

  def matchGlob(entries: Seq[DatasetEntry], glob: String): Seq[DatasetEntry] = {
    val re = globToRegex(glob)
    entries.filter(e => re.matches(e.name))
  }

  def matchRegex(entries: Seq[DatasetEntry], regex: String): Seq[DatasetEntry] =
    entries.filter(_.name.matches(regex))

  /** `matchOne`: exact first, then glob, then regex; must be unambiguous. */
  def matchOne(entries: Seq[DatasetEntry], spec: String): DatasetEntry = {
    findExact(entries, spec).getOrElse {
      val g = matchGlob(entries, spec)
      val candidates = if (g.nonEmpty) g else matchRegex(entries, spec)
      candidates match {
        case Seq(one) => one
        case Seq()    => throw new NoSuchElementException(s"no dataset matches '$spec'")
        case many     => throw new IllegalArgumentException(
          s"ambiguous dataset spec '$spec': ${many.map(_.name).mkString(", ")}")
      }
    }
  }

  private def globToRegex(glob: String): scala.util.matching.Regex =
    ("^" + glob.flatMap {
      case '*' => ".*"
      case '?' => "."
      case c if "\\.[]{}()+-^$|".contains(c) => "\\" + c
      case c => c.toString
    } + "$").r

  /** `"name:profile"` selection (Catalog.java:233-258). */
  def select(entries: Seq[DatasetEntry], spec: String): (DatasetEntry, String) = {
    val (name, profile) = spec.split(":", 2) match {
      case Array(n)    => (n, "default")
      case Array(n, p) => (n, p)
    }
    (matchOne(entries, name), profile)
  }

  // ---- P11 token templating (Templatizer) ----

  private val tokenPattern = "\\$\\{([A-Za-z0-9_.]+)\\}".r

  def templatize(template: String, tokens: Map[String, String]): String =
    tokenPattern.replaceAllIn(template, m =>
      scala.util.matching.Regex.quoteReplacement(
        tokens.getOrElse(m.group(1),
          throw new IllegalArgumentException(s"unresolved token: ${m.group(1)}"))))

  // ---- P12 attribute access: "/profiles/default/base_vectors:attr" ----

  def attrValue(entry: DatasetEntry, spec: String): Option[String] = {
    val (path, attr) = spec.split(":", 2) match {
      case Array(p, a) => (p, a)
      case Array(p)    => (p, "")
    }
    val parts = path.stripPrefix("/").split("/").filter(_.nonEmpty)
    parts.toList match {
      case Nil => entry.attributes.get(attr)
      case "attributes" :: Nil => entry.attributes.get(attr)
      case "profiles" :: p :: rest =>
        entry.profiles.get(p).flatMap { prof =>
          rest match {
            case Nil => if (attr.isEmpty) Some(prof.name) else None
            case facet :: Nil => prof.facets.get(facetAliases.getOrElse(facet, facet)).map { fs =>
              attr match {
                case "source" | "" => fs.path
                case "window"      => fs.window.intervals.map(i => s"${i.minIncl}..${i.maxExcl}").mkString(",")
                case "kind"        => fs.kind
                case _             => return None
              }
            }
            case _ => None
          }
        }
      case _ => None
    }
  }
}
